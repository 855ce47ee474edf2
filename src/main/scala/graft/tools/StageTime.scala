package graft.tools
import org.apache.spark.sql.functions._
import graft.pipeline._
object StageTime {
  def main(args: Array[String]): Unit = {
    val n = 4000000L
    val spark = GraftSession.local(2, "stage-time")
    val parts = 4
    def time(f: => Any): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def seqs = DataGen.sequences(spark, n, parts)
    // warm
    Pipeline.routedRecords(DataGen.sequences(spark, 10000L, parts), DataGen.routingRules).count()
    val stages = Seq[(String, () => Any)](
      "gen_count" -> (() => seqs.count()),
      "filter_count" -> (() => FilterStage.applyStatic(Parse.deriveFields(seqs), DataGen.routingRules).count()),
      "routed_count" -> (() => Pipeline.routedRecords(seqs, DataGen.routingRules).count()),
      "agg_full" -> (() => Pipeline.routedRecords(seqs, DataGen.routingRules)
        .groupBy("content_type", "operation").count().count()),
      "agg_ct_only" -> (() => Pipeline.routedRecords(seqs, DataGen.routingRules)
        .groupBy("content_type").count().count()),
      "routed_sum_rt" -> (() => Pipeline.routedRecords(seqs, DataGen.routingRules)
        .agg(sum("record_type")).collect())
    )
    for ((name, f) <- stages) {
      val t = (1 to 2).map(_ => time(f())).min
      println(f"STAGE $name%-14s $t%.2f s")
    }
    spark.stop()
  }
}
