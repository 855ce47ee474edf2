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
 * All derivations are PORTABLE integer arithmetic over the numeric doc
 * index — the affine family ((id mod P) * A_s + B_s) mod P shared with
 * DedupOps — so the flagship pipeline is bit-reproducible in any engine
 * (the DuckDB oracle for q_pipeline_prtg recomputes every field with
 * plain BIGINT math; xxhash64 would have no cross-engine equivalent).
 * Everything is deterministic, whole-stage-codegen'd, no UDFs
 * (SURVEY.md §2.7 F10). The token arrays pass through untouched: the
 * north-rule invariant is per-row token-array equality end to end.
 */
object Parse {

  /** Epoch seconds of 2026-01-01T00:00:00Z — base of CreationTime. */
  val BaseEpoch: Long = 1767225600L
  /** CreationTime spans 168h (604800 s) to exercise window splitting
    * (reference: src/config.rs:29-56 caps look-back at 168 h). */
  val SpanSeconds: Long = 604800L

  /** Same prime + affine family as DedupOps/TextOps — one portable hash
    * family across the whole engine. */
  val P: Long = 1000000007L
  private def affineA(s: Int): Long = 2654435761L % P + 2L * s + 1L
  private def affineB(s: Int): Long = 1013904223L + 7919L * s

  /** Numeric index of a `doc-%012d` id (DataGen's format). Codegen'd
    * byte-level digit parse — the derivations below get inlined a dozen+
    * times into the pushed-down filter condition (where short-circuit
    * evaluation forbids subexpression hoisting), so this must cost
    * nanoseconds per occurrence; the substring(5,12).cast(long)
    * formulation (same semantics, pinned in FunctionsSpec) made the whole
    * pipeline 3.5x slower. */
  def idNum(docId: Column): Column =
    graft.functions.GraftFunctions.doc_id_num(docId)

  /** Portable affine mix s of the doc index: ((id mod P)*A_s + B_s) mod P.
    * (id mod P)*A_s < P * 7e8 < 2^63 — no overflow on any engine. */
  def mix(docId: Column, s: Int): Column =
    pmod(pmod(idNum(docId), lit(P)) * affineA(s) + affineB(s), lit(P))

  private def typedLit(xs: Seq[String]): Column = array(xs.map(lit): _*)

  private def af(docId: Column, kind: String): Column =
    graft.functions.GraftFunctions.audit_field(docId, kind)

  /** element_at over a literal array, NULL-gated on the (nullable) audit
    * field. The gate is not redundant: Spark's ElementAt reports
    * nullable=false for a literal non-null-element array even when the
    * INDEX is nullable, so `derived.isNull` constant-folds to false while
    * the runtime value actually is null for malformed ids — which made
    * NULL-field rows fail the routing filter as NULL instead of passing to
    * quarantine. when() restores honest nullability metadata. */
  private def pick(values: Seq[String], field: Column): Column =
    when(field.isNotNull, element_at(typedLit(values), field + 1))

  /** Skewed content-type pick: 50/20/15/10/5 % — the 50% dominant type
    * (Audit.General) exercises the salted-repartition / AQE skew path. */
  def contentTypeCol(docId: Column): Column =
    pick(Schemas.ContentTypes, af(docId, "Ct"))

  /** Column-arithmetic REFERENCE formulations of the derivations — what
    * the audit kernels must equal bit-for-bit (pinned in FunctionsSpec and
    * mirrored by the DuckDB oracles). Production uses the kernels: these
    * expansions get inlined a dozen+ times into the pushed-down filter
    * condition, whose generated method then exceeds HotSpot's 8K-bytecode
    * JIT limit and runs interpreted (measured 22 s vs 1 s on a 4M-row
    * filter). */
  def contentTypeColRef(docId: Column): Column = {
    val h = pmod(mix(docId, 1), lit(100))
    when(h < 50, Schemas.ContentTypes(0))
      .when(h < 70, Schemas.ContentTypes(1))
      .when(h < 85, Schemas.ContentTypes(2))
      .when(h < 95, Schemas.ContentTypes(3))
      .otherwise(Schemas.ContentTypes(4))
  }

  def policyColRef(docId: Column): Column =
    when(contentTypeColRef(docId) === Schemas.ContentTypes(0) &&
         pmod(mix(docId, 6), lit(10)) =!= 0,
      when(pmod(mix(docId, 7), lit(4)) === 0, "Spoof").otherwise("Phish"))

  /**
   * Derive all audit fields. Input: sequences(doc_id, tokens, n_tok, source).
   * Output adds: content_type, workload, operation, record_type,
   * CreationTime (string, `yyyy-MM-dd'T'HH:mm:ss` — the reference's
   * `%Y-%m-%dT%H:%M:%S` format, src/interfaces/graylog_interface.rs:100),
   * Policy (nullable — ~10% of Audit.General rows have it absent, pinning
   * the absent-key-passes filter semantics of src/collector.rs:176-184).
   */
  def deriveFields(df: DataFrame): DataFrame = {
    val id = col("doc_id")
    df
      .withColumn("content_type", contentTypeCol(id))
      .withColumn("workload", pick(Schemas.Workloads, af(id, "Wl")))
      .withColumn("operation", pick(Schemas.Operations, af(id, "Op")))
      .withColumn("record_type", af(id, "Rt"))
      .withColumn("CreationTime",
        date_format(
          timestamp_seconds(graft.functions.GraftFunctions.audit_ts(id, BaseEpoch, SpanSeconds)),
          "yyyy-MM-dd'T'HH:mm:ss"))
      .withColumn("Policy",
        when(af(id, "Policy") === 1, "Spoof")
          .when(af(id, "Policy") === 2, "Phish"))
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
