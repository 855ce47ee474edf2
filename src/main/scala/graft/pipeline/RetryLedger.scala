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
 * Because the failure predicate is a pure Column function (per-row,
 * per-attempt), the whole retry loop folds into ONE projection: a row's
 * ledger entry is the first attempt that clears, else give-up at
 * `maxAttempts`. A loop of per-round filters would re-scan the source once
 * per attempt (each union branch reads from the top — the "shrinking
 * pending set" shrinks logically, not in scans); the single-pass form costs
 * exactly one scan at any corpus size and stays inside whole-stage codegen.
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
    val fails = (1 to maxAttempts).map(a => failsOnAttempt(col(idCol), a))
    // first attempt that clears; rows failing every attempt bottom out at
    // maxAttempts (tries consumed by the give-up)
    val attempts = (1 until maxAttempts).foldRight(lit(maxAttempts)) {
      case (a, acc) => when(!fails(a - 1), lit(a)).otherwise(acc)
    }
    val anyOk = fails.map(f => !f).reduce(_ || _)
    df.withColumn("attempts", attempts)
      .withColumn("status", when(anyOk, lit("ok")).otherwise(lit("error")))
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
