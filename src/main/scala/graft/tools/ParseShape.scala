package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline._

/** Dev tool: A/B the portable-affine parse vs the round-1 xxhash64 parse
  * inside the full routedRecords compute, interleaved in one session. */
object ParseShape {
  def main(args: Array[String]): Unit = {
    val n = 4000000L
    val spark = GraftSession.local(2, "parse-shape")
    val parts = 4

    def typedLit(xs: Seq[String]): Column = array(xs.map(lit): _*)
    def oldDerive(df: DataFrame): DataFrame = {
      val h = pmod(xxhash64(col("doc_id")), lit(100))
      val ct = when(h < 50, Schemas.ContentTypes(0))
        .when(h < 70, Schemas.ContentTypes(1))
        .when(h < 85, Schemas.ContentTypes(2))
        .when(h < 95, Schemas.ContentTypes(3))
        .otherwise(Schemas.ContentTypes(4))
      val t1 = col("tokens").getItem(1)
      val t3 = col("tokens").getItem(3)
      df.withColumn("content_type", ct)
        .withColumn("operation",
          element_at(typedLit(Schemas.Operations), (pmod(t1, lit(12)) + 1).cast("int")))
        .withColumn("CreationTime",
          date_format(timestamp_seconds(lit(Parse.BaseEpoch) +
            pmod(xxhash64(col("doc_id"), lit(3)), lit(Parse.SpanSeconds))),
            "yyyy-MM-dd'T'HH:mm:ss"))
        .withColumn("Policy",
          when(col("content_type") === Schemas.ContentTypes(0) &&
               pmod(xxhash64(col("doc_id"), lit(11)), lit(10)) =!= 0,
            when(pmod(t3, lit(4)) === 0, "Spoof").otherwise("Phish")))
    }
    def run(derive: DataFrame => DataFrame): Long = {
      val parsed = derive(DataGen.sequences(spark, n, parts))
      val filtered = FilterStage.applyStatic(parsed, DataGen.routingRules)
      Route.routed(filtered).groupBy("content_type", "operation").count().count()
    }
    def time(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    run(oldDerive); run(Parse.deriveFields) // warm both
    var bo = Double.MaxValue; var bn = Double.MaxValue
    for (i <- 1 to 3) {
      bo = math.min(bo, time(run(oldDerive)))
      bn = math.min(bn, time(run(Parse.deriveFields)))
      println(f"ROUND $i old(xxhash)=$bo%.2f new(affine)=$bn%.2f")
    }
    spark.stop()
  }
}
