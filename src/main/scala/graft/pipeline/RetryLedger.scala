package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Bounded-retry ledger — the transport half of ST6 (reference:
 * src/collector.rs:469-515). The reference re-queues a failed blob fetch up
 * to a retry cap, then gives up and accounts it: "blobs_retried" (needed
 * more than one try) and "blobs_error" (exhausted the cap) are distinct
 * run-stat metrics from the poison-row quarantine (JsonIngest handles that
 * half — a payload that can never parse is not retried, it is quarantined).
 *
 * The retry loop is expressed as `maxAttempts` filter rounds over a
 * shrinking pending set: round `a` keeps the rows whose (deterministic or
 * external) failure predicate clears at attempt `a`, the remainder carries
 * to round `a+1`, and whatever survives every round is ledgered as an
 * error. Each round is a narrow filter — no shuffle, no driver collect —
 * and the final ledger is a bag union, so at 100 TB the whole construct
 * costs one pass per attempt over an exponentially-shrinking set.
 *
 * The failure predicate is injected: tests and the harness query use the
 * portable affine family ([[affineFailure]], reproducible in any engine);
 * a real deployment would instead join attempt outcomes from its transport
 * log. Spark's own task-retry config covers transient executor failures
 * underneath this — the ledger is the APPLICATION-level bounded retry.
 */
object RetryLedger {

  /** Ledger rows: the input row + `attempts` (1-based tries consumed) +
    * `status` ("ok" | "error"). */
  def run(df: DataFrame, idCol: String, maxAttempts: Int)
         (failsOnAttempt: (Column, Int) => Column): DataFrame = {
    require(maxAttempts >= 1)
    var pending = df
    var ledger: DataFrame = null
    for (a <- 1 to maxAttempts) {
      val fails = failsOnAttempt(col(idCol), a)
      val ok = pending.filter(!fails)
        .withColumn("attempts", lit(a))
        .withColumn("status", lit("ok"))
      ledger = if (ledger == null) ok else ledger.unionByName(ok)
      pending = pending.filter(fails)
    }
    val errors = pending
      .withColumn("attempts", lit(maxAttempts))
      .withColumn("status", lit("error"))
    ledger.unionByName(errors)
  }

  /** Run-stat accounting over a ledger (reference collector.rs metric
    * names): ok / retried (ok but needed >1 try) / error, one job. */
  case class Metrics(blobsOk: Long, blobsRetried: Long, blobsError: Long)
  def metrics(ledger: DataFrame): Metrics = {
    val r = ledger.agg(
      sum(when(col("status") === "ok", 1L).otherwise(0L)),
      sum(when(col("status") === "ok" && col("attempts") > 1, 1L).otherwise(0L)),
      sum(when(col("status") === "error", 1L).otherwise(0L))).head()
    def g(i: Int) = if (r.isNullAt(i)) 0L else r.getLong(i)
    Metrics(g(0), g(1), g(2))
  }

  /** Deterministic simulated transport: attempt `a` of row `id` fails with
    * probability failPerMille/1000, independently per attempt — the same
    * portable affine mix family as Parse/DedupOps (stream s = 100+a), so a
    * DuckDB oracle reproduces every attempt outcome exactly. */
  def affineFailure(failPerMille: Int)(id: Column, attempt: Int): Column = {
    val P = Parse.P
    val s = 100 + attempt
    val a = 2654435761L % P + 2L * s + 1L
    val b = 1013904223L + 7919L * s
    pmod(pmod(pmod(id, lit(P)) * a + b, lit(P)), lit(1000)) < failPerMille
  }
}
