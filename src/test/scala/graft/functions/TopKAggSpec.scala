package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the round-6 `topk_ids` aggregate bit-identical to the window
  * formulation it replaced in every probe tail (SimilarityOps.rankTopK):
  * same ordering (nan-safe double compare, Spark default null ordering,
  * id-ascending ties), same output rows/ranks, partitioning-invariant. */
class TopKAggSpec extends SparkSuite {

  import spark.implicits._

  /** Seeded scored set with ties, NaN keys, null keys, uneven group
    * sizes (some below k, some far above). */
  private def scored(seed: Long): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until 5000).map { i =>
      val g = rnd.nextInt(37).toLong
      val key: java.lang.Double =
        if (rnd.nextInt(50) == 0) null
        else if (rnd.nextInt(50) == 1) Double.NaN
        else (rnd.nextInt(8).toDouble / 4.0) // few distinct values → ties
      (g, key, rnd.nextInt(200).toLong + 1000L)
    }
    rows.toDF("g", "key", "id")
      // duplicates on (g, key, id) are fine: the kept ID SET is what the
      // formulations must agree on (row_number splits exact-duplicate rows
      // arbitrarily but their ids are equal)
      .dropDuplicates("g", "key", "id")
  }

  private def windowTopK(df: DataFrame, k: Int, desc: Boolean): Set[(Long, Long, Int)] = {
    val key = if (desc) col("key").desc else col("key").asc
    val w = Window.partitionBy("g").orderBy(key, col("id"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("g", "id", "rank")
      .as[(Long, Long, Int)].collect().toSet
  }

  private def aggTopK(df: DataFrame, k: Int, desc: Boolean): Set[(Long, Long, Int)] =
    df.groupBy("g")
      .agg(GraftAggregates.topk_ids(col("key"), col("id"), k, desc).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("p", "id")))
      .select(col("g"), col("id"), (col("p") + 1).as("rank"))
      .as[(Long, Long, Int)].collect().toSet

  for (k <- Seq(1, 3, 20); desc <- Seq(true, false)) {
    test(s"topk_ids(k=$k, desc=$desc) ≡ row_number window incl. ties/NaN/null keys") {
      val df = scored(42 + k)
      assert(aggTopK(df, k, desc) === windowTopK(df, k, desc))
    }
  }

  test("topk_ids is partitioning-invariant (map-side partial merge)") {
    val df = scored(7)
    val a = aggTopK(df.repartition(1), 5, desc = true)
    val b = aggTopK(df.repartition(13), 5, desc = true)
    assert(a === b)
    assert(a === windowTopK(df, 5, desc = true))
  }

  test("topk_ids null-id rows keep the window's null-ordering on ties") {
    val df = Seq[(Long, java.lang.Double, java.lang.Long)](
      (1L, 1.0, 10L), (1L, 1.0, null), (1L, 2.0, 5L),
      (2L, null, 1L), (2L, 3.0, 2L)
    ).toDF("g", "key", "id")
    // window formulation (asc): null id sorts FIRST on the key tie
    val w = Window.partitionBy("g").orderBy(col("key").asc, col("id").asc)
    val expect = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 2)
      .select("g", "id", "rank")
      .as[(Long, Option[Long], Int)].collect().toSet
    val got = df.groupBy("g")
      .agg(GraftAggregates.topk_ids(col("key"), col("id"), 2, desc = false).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("p", "id")))
      .select(col("g"), col("id"), (col("p") + 1).as("rank"))
      .as[(Long, Option[Long], Int)].collect().toSet
    assert(got === expect)
  }

  test("topk_ids aggregates with a partial (map-side) phase") {
    val df = scored(3)
    val plan = df.groupBy("g")
      .agg(GraftAggregates.topk_ids(col("key"), col("id"), 3, desc = true).as("t"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_ids"),
      s"no partial topk_ids phase before the exchange:\n$plan")
  }
}
