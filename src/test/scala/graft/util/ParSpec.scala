package graft.util

import graft.SparkSuite
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Pins Par.ensure's safety contract (round-6 review finding): inspecting
  * a plan must NEVER execute it. A physical-plan Exchange check is not
  * enough — EnsureRequirements inserts implicit exchanges after sparkPlan,
  * and forcing such a plan's RDD under AQE synchronously runs its shuffle
  * stages. The guard therefore whitelists narrow logical plans only. */
class ParSpec extends SparkSuite {

  import spark.implicits._

  private def countJobs(f: => Unit): Int = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(l)
    // listener delivery is async; give the bus time to drain (same
    // technique as SimilarityOpsSpec's zero-jobs test)
    try { f; Thread.sleep(1500) }
    finally spark.sparkContext.removeSparkListener(l)
    jobs.get()
  }

  test("ensure floors a narrow plan without running jobs") {
    val df = spark.range(0, 100, 1, 1).select(col("id"), (col("id") * 2).as("x"))
    var out: org.apache.spark.sql.DataFrame = null
    val jobs = countJobs { out = Par.ensure(df) }
    assert(jobs === 0, "plan inspection must run zero jobs")
    assert(out.rdd.getNumPartitions >= math.min(4, spark.sparkContext.defaultParallelism))
    assert(out.as[(Long, Long)].collect().toSet === df.as[(Long, Long)].collect().toSet)
  }

  test("ensure is a no-op (zero jobs, same plan) for shuffling inputs") {
    for (shuffling <- Seq(
      spark.range(0, 100, 1, 1).groupBy((col("id") % 10).as("k")).count(),
      spark.range(0, 100, 1, 1).toDF("id").dropDuplicates("id"),
      spark.range(0, 100, 1, 1).toDF("id").repartition(2))) {
      var out: org.apache.spark.sql.DataFrame = null
      val jobs = countJobs { out = Par.ensure(shuffling) }
      assert(jobs === 0,
        s"ensure executed a shuffle stage of:\n${shuffling.queryExecution.logical}")
      assert(out eq shuffling, "shuffling inputs must pass through untouched")
    }
  }

  test("ensure leaves an already-parallel scan untouched") {
    val wide = spark.range(0, 1000, 1, 16).toDF("id")
    assert(Par.ensure(wide) eq wide)
  }
}
