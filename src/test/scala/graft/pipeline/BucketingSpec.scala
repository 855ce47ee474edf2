package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/**
 * Bucketed co-located joins — the zero-shuffle repeated-join layout for
 * 100 TB fact-to-fact joins (SURVEY.md §4.2 / builder prompt: "bucketing
 * for co-located joins"). Both tables are written bucketed by the join key;
 * the join then needs NO exchange on either side.
 */
class BucketingSpec extends SparkSuite {

  private def withNoBroadcast[A](f: => A): A = {
    // the tables are tiny here, so Catalyst would broadcast; the property
    // under test is the big-big case where broadcast is impossible
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // shared fixture: each test (re)creates the bucketed tables it reads, so
  // suites and single-test runs never depend on execution order or on
  // stale tables in the shared warehouse
  private def writeBucketedTables(): Unit = {
    val seqs = Parse.deriveFields(DataGen.sequences(spark, 2000L, 4))
    spark.sql("DROP TABLE IF EXISTS seq_bucketed")
    spark.sql("DROP TABLE IF EXISTS state_bucketed")
    seqs.select("doc_id", "content_type", "n_tok")
      .write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("seq_bucketed")
    seqs.select(col("doc_id"), col("operation"))
      .write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("state_bucketed")
  }

  test("join of two tables bucketed on the key runs with zero exchanges") {
    writeBucketedTables()
    withNoBroadcast {
      val joined = spark.table("seq_bucketed")
        .join(spark.table("state_bucketed"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan must use buckets:\n$plan")
      assert(joined.count() === 2000L)
    }
  }

  test("bucketed anti-join (dedup shape) is also exchange-free") {
    writeBucketedTables()
    withNoBroadcast {
      val anti = spark.table("seq_bucketed")
        .join(spark.table("state_bucketed").filter(col("operation") === "SendAs"),
          Seq("doc_id"), "left_anti")
      val plan = anti.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"plan:\n$plan")
      assert(anti.count() > 0)
    }
  }
}
