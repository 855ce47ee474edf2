package graft.plans

import graft.SparkSuite
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSuite {
  import spark.implicits._

  val docs = Seq(
    (1L, "a b c d e"), (2L, "a b c d x"), (3L, "p q r s t"), (4L, ""))
    .toDF("id", "text")

  private def naive = {
    val a = docs.select(col("id").as("id_a"), col("text").as("ta"))
    val b = docs.select(col("id").as("id_b"), col("text").as("tb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(shingle_hashes(col("ta"), 2), shingle_hashes(col("tb"), 2)))
          .as("inter"),
        size(array_union(shingle_hashes(col("ta"), 2), shingle_hashes(col("tb"), 2)))
          .as("uni"))
  }

  test("FuseJaccardCounts rewrites the textbook formulation to the fused kernel") {
    val plan = naive.queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("jaccardcounts"),
      s"expected the fused kernel in the optimized plan:\n$plan")
    assert(!plan.contains("array_intersect"),
      s"naive intersect should be gone:\n$plan")
  }

  test("rewrite preserves results exactly (vs rule disabled)") {
    val fusedRows = naive.as[(Long, Long, Int, Int)].collect().toSet
    spark.conf.set("spark.sql.optimizer.excludedRules",
      FuseJaccardCounts.ruleName)
    try {
      val plainPlan = naive.queryExecution.optimizedPlan.toString
      assert(plainPlan.contains("array_intersect"), s"rule must be off:\n$plainPlan")
      val plainRows = naive.as[(Long, Long, Int, Int)].collect().toSet
      assert(fusedRows === plainRows)
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("guard: the rule never fires on arrays that may contain duplicates") {
    val df = Seq((Seq(1L, 1L, 2L), Seq(1L, 3L))).toDF("a", "b")
      .select(size(array_intersect(col("a"), col("b"))).as("i"),
              size(array_union(col("a"), col("b"))).as("u"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("jaccardcounts"), s"unsound rewrite:\n$plan")
    // and the built-in dedup semantics stand
    assert(df.as[(Int, Int)].head() === ((1, 3)))
  }

  test("guard: the rule never fires under legacy sizeOfNull semantics") {
    // legacy Size(null) = -1; the fused kernel is null-propagating — firing
    // there would silently change results under that (non-default) config.
    // ANSI mode force-disables the legacy semantics, so turn it off too —
    // under Spark 4 defaults this combination is the only way Size carries
    // legacySizeOfNull=true.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
    try {
      val plan = naive.queryExecution.optimizedPlan.toString
      assert(!plan.toLowerCase.contains("jaccardcounts"),
        s"rule must not fire with legacySizeOfNull=true:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.legacy.sizeOfNull")
      spark.conf.unset("spark.sql.ansi.enabled")
    }
  }
}
