package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Per-content-type conjunctive equality filter — the reference's only
 * predicate (src/collector.rs:176-184; filter map built from config at
 * src/config.rs:197-218). Exact semantics:
 *
 *   for the record's content type, for EACH (key, value) rule:
 *     if the record HAS key and record[key] != value  → drop
 *   records MISSING the key PASS (absent-key-passes);
 *   content types with no rules pass everything.
 *
 * Two implementations with identical semantics (equivalence pinned by
 * FilterSpec):
 *
 *  - `applyStatic`: rules are driver-known config (≤ a handful of rows, like
 *    the reference's YAML filter map), so we constant-fold them into one
 *    codegen'd predicate: `AND_k (col(k).isNull || col(k) === v)` guarded by
 *    content type. Zero shuffle, zero join — this is the production path.
 *
 *  - `applyJoin`: the north-star "broadcast-hash-join enrich stage" — melt
 *    each record's filterable keys to (key, value) pairs, broadcast-join the
 *    rules table, and keep rows where every applicable rule is satisfied.
 *    Used when rules live in a table rather than config. Still shuffle-free
 *    on the big side (broadcast), but adds an explode; prefer applyStatic.
 */
object FilterStage {

  /** Rule-key → column resolution: exact match first, then
    * case-insensitive (the reference's API payloads use capitalized keys
    * like `Operation` — Release/ConfigExamples/filter.yaml — while our
    * derived schema is lower-case). A rule whose key is not a column at
    * all behaves as "record missing key" → passes (matches the reference:
    * a key absent from the record map passes). */
  private def colFor(df: DataFrame, key: String): Option[Column] =
    df.columns.find(_ == key)
      .orElse(df.columns.find(_.equalsIgnoreCase(key)))
      .map(col)

  def predicate(df: DataFrame, rules: Seq[RoutingRule]): Column = {
    val byType = rules.groupBy(_.content_type)
    byType.foldLeft(lit(true)) { case (acc, (ct, rs)) =>
      val perType = rs.foldLeft(lit(true)) { (a, r) =>
        colFor(df, r.key) match {
          case Some(c) => a && (c.isNull || c === lit(r.value))
          case None    => a // key not in schema → absent → passes
        }
      }
      acc && (col("content_type") =!= lit(ct) || perType)
    }
  }

  def applyStatic(df: DataFrame, rules: Seq[RoutingRule]): DataFrame =
    df.filter(predicate(df, rules))

  /**
   * Broadcast-hash-join variant. `rulesDf` has schema
   * (content_type, key, value). Rules are pre-aggregated per content type on
   * the (tiny) broadcast side — `collect_list(struct(key, value))` — so the
   * fact side needs exactly one broadcast join and one `forall` filter:
   * no explode, no shuffle, no re-aggregation of the big side.
   */
  def applyJoin(df: DataFrame, rulesDf: DataFrame, filterableKeys: Seq[String]): DataFrame = {
    val present = filterableKeys.filter(df.columns.contains)
    // keys lower-cased on BOTH sides so rule-key resolution matches
    // applyStatic's case-insensitive fallback (reference configs use
    // capitalized keys like "Operation" against our lower-case columns)
    val kv = map(present.flatMap(k => Seq(lit(k.toLowerCase), col(k).cast("string"))): _*)
    val rulesAgg = rulesDf.groupBy("content_type")
      .agg(collect_list(struct(lower(col("key")).as("key"), col("value"))).as("__rules"))
    df.withColumn("__kv", kv)
      .join(broadcast(rulesAgg), Seq("content_type"), "left_outer")
      .filter(col("__rules").isNull ||
        forall(col("__rules"), r =>
          element_at(col("__kv"), r.getField("key")).isNull ||
          element_at(col("__kv"), r.getField("key")) === r.getField("value")))
      .select(df.columns.map(col): _*) // join reorders; restore input order
  }
}
