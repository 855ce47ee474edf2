package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Parse stage: derive the audit-record fields the reference routes and
 * filters on — content_type, workload, operation, record_type,
 * CreationTime, Policy — from each tokenized sequence row
 * (reference: src/collector.rs:174-192 consumes these keys;
 * src/data_structures.rs:40-49 routes on content type).
 *
 * All derivations are pure column functions of (doc_id, tokens) —
 * deterministic, whole-stage-codegen'd, no UDFs (SURVEY.md §2.7 F10).
 * The token arrays pass through untouched: the north-rule invariant is
 * per-row token-array equality end to end.
 */
object Parse {

  /** Epoch seconds of 2026-01-01T00:00:00Z — base of CreationTime. */
  val BaseEpoch: Long = 1767225600L
  /** CreationTime spans 168h (604800 s) to exercise window splitting
    * (reference: src/config.rs:29-56 caps look-back at 168 h). */
  val SpanSeconds: Long = 604800L

  private def typedLit(xs: Seq[String]): Column = array(xs.map(lit): _*)

  /** Skewed content-type pick: 50/20/15/10/5 % — the 50% dominant type
    * (Audit.General) exercises the salted-repartition / AQE skew path. */
  def contentTypeCol(docId: Column): Column = {
    val h = pmod(xxhash64(docId), lit(100))
    when(h < 50, Schemas.ContentTypes(0))
      .when(h < 70, Schemas.ContentTypes(1))
      .when(h < 85, Schemas.ContentTypes(2))
      .when(h < 95, Schemas.ContentTypes(3))
      .otherwise(Schemas.ContentTypes(4))
  }

  /**
   * Derive all audit fields. Input: sequences(doc_id, tokens, n_tok, source).
   * Output adds: content_type, workload, operation, record_type,
   * CreationTime (string, `yyyy-MM-dd'T'HH:mm:ss` — the reference's
   * `%Y-%m-%dT%H:%M:%S` format, src/interfaces/graylog_interface.rs:100),
   * Policy (nullable — ~10% of Audit.General rows have it absent, pinning
   * the absent-key-passes filter semantics of src/collector.rs:176-184).
   */
  def deriveFields(df: DataFrame): DataFrame = {
    val t0 = col("tokens").getItem(0)
    val t1 = col("tokens").getItem(1)
    val t2 = col("tokens").getItem(2)
    val t3 = col("tokens").getItem(3)
    df
      .withColumn("content_type", contentTypeCol(col("doc_id")))
      .withColumn("workload",
        element_at(typedLit(Schemas.Workloads), (pmod(t0, lit(6)) + 1).cast("int")))
      .withColumn("operation",
        element_at(typedLit(Schemas.Operations), (pmod(t1, lit(12)) + 1).cast("int")))
      .withColumn("record_type", pmod(t2, lit(64)).cast("int"))
      .withColumn("CreationTime",
        date_format(
          timestamp_seconds(lit(BaseEpoch) + pmod(xxhash64(col("doc_id"), lit(3)), lit(SpanSeconds))),
          "yyyy-MM-dd'T'HH:mm:ss"))
      .withColumn("Policy",
        when(col("content_type") === Schemas.ContentTypes(0) &&
             pmod(xxhash64(col("doc_id"), lit(11)), lit(10)) =!= 0,
          when(pmod(t3, lit(4)) === 0, "Spoof").otherwise("Phish")))
  }

  /**
   * The "grok" path of the north star: render each record as a canonical
   * log line, then extract the fields back with vectorized regexes
   * (a batch of codegen'd `regexp_extract`s — SURVEY.md §2.7 F10).
   *
   * Used to prove the regex parse stage round-trips losslessly against the
   * direct derivation (ParseSpec); production uses deriveFields (no string
   * detour) but a real deployment parsing textual logs would run exactly
   * this extract stage.
   */
  def renderLogLine(df: DataFrame): DataFrame =
    df.withColumn("raw_line",
      format_string("ts=%s ct=%s wl=%s op=%s rt=%d doc=%s",
        col("CreationTime"), col("content_type"), col("workload"),
        col("operation"), col("record_type"), col("doc_id")))

  def grokExtract(df: DataFrame): DataFrame = {
    def ex(pat: String) = regexp_extract(col("raw_line"), pat, 1)
    df
      .withColumn("g_CreationTime", ex("ts=(\\S+)"))
      .withColumn("g_content_type", ex("ct=(\\S+)"))
      .withColumn("g_workload", ex("wl=(\\S+)"))
      .withColumn("g_operation", ex("op=(\\S+)"))
      .withColumn("g_record_type", ex("rt=(\\d+)").cast("int"))
      .withColumn("g_doc_id", ex("doc=(\\S+)"))
  }
}
