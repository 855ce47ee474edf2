package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RetryLedgerSpec extends SparkSuite {
  import spark.implicits._

  // ids 0..99; id mod 4 = k fails its first k attempts: k=0 → ok@1,
  // k=1 → ok@2, k=2 → ok@3, k=3 → exhausted (error@3)
  private def input = spark.range(100).select(col("id"))
  private def failFirstK(id: org.apache.spark.sql.Column, attempt: Int) =
    pmod(id, lit(4)) >= attempt

  test("deterministic injection: per-row attempts and statuses are exact") {
    val ledger = RetryLedger.run(input, "id", maxAttempts = 3)(failFirstK)
      .select(col("id"), col("attempts"), col("status"))
      .as[(Long, Int, String)].collect()
    assert(ledger.length === 100, "each input row appears exactly once")
    ledger.foreach { case (id, attempts, status) =>
      val k = (id % 4).toInt
      if (k <= 2) assert((attempts, status) === ((k + 1, "ok")), s"id=$id")
      else assert((attempts, status) === ((3, "error")), s"id=$id")
    }
  }

  test("metrics: ok / retried / error accounting matches the reference's split") {
    val ledger = RetryLedger.run(input, "id", maxAttempts = 3)(failFirstK)
    val m = RetryLedger.metrics(ledger)
    // 25 ids per residue class: ok = k∈{0,1,2}, retried = ok needing >1 try
    // (k∈{1,2}), error = k=3 — and retried NEVER double-counts errors
    assert(m === RetryLedger.Metrics(blobsOk = 75, blobsRetried = 50, blobsError = 25))
  }

  test("maxAttempts=1 degenerates to a single try (no retry rounds)") {
    val ledger = RetryLedger.run(input, "id", maxAttempts = 1)(failFirstK)
    val m = RetryLedger.metrics(ledger)
    assert(m === RetryLedger.Metrics(blobsOk = 25, blobsRetried = 0, blobsError = 75))
  }

  test("affineFailure is deterministic and ~60% per attempt") {
    val n = 20000L
    val fails = spark.range(n)
      .filter(RetryLedger.affineFailure(600)(col("id"), 1)).count()
    assert(math.abs(fails.toDouble / n - 0.6) < 0.02, s"rate=${fails.toDouble / n}")
    // independent-ish across attempts: the joint rate is ≈ 0.36
    val both = spark.range(n)
      .filter(RetryLedger.affineFailure(600)(col("id"), 1) &&
              RetryLedger.affineFailure(600)(col("id"), 2)).count()
    assert(math.abs(both.toDouble / n - 0.36) < 0.02, s"joint=${both.toDouble / n}")
  }
}
