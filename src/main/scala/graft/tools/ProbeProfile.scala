package graft.tools

import org.apache.spark.sql.functions._
import graft.pipeline._

/** Dev tool: decompose the scaling-probe compute at two parallelism levels —
  * token gen only vs +parse vs full routedRecords — to attribute probe time
  * and efficiency. */
object ProbeProfile {
  def main(args: Array[String]): Unit = {
    val n = 4000000L
    def time(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (cores <- Seq(2, 8)) {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      val spark = GraftSession.local(cores, s"probe-$cores")
      val parts = cores * 2
      // warm
      Pipeline.routedRecords(DataGen.sequences(spark, 10000L, parts), DataGen.routingRules).count()
      val tGen = (1 to 3).map(_ => time(
        DataGen.sequences(spark, n, parts).agg(sum(length(col("doc_id")))).collect())).min
      val tParse = (1 to 3).map(_ => time(
        Parse.deriveFields(DataGen.sequences(spark, n, parts))
          .agg(sum(length(col("operation")))).collect())).min
      val tFull = (1 to 3).map(_ => time(
        Pipeline.routedRecords(DataGen.sequences(spark, n, parts), DataGen.routingRules)
          .groupBy("content_type", "operation").count().collect())).min
      println(f"PROFILE cores=$cores gen=$tGen%.2f parse=$tParse%.2f full=$tFull%.2f rows/s_full=${n / tFull}%.0f")
      spark.stop()
    }
  }
}
