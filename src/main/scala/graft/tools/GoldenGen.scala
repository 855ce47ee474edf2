package graft.tools

import graft.pipeline._

/** Dev tool: recompute the GoldenSpec per-sink counts + checksums for the
  * 10k-row fixture. Run after any intentional semantic change to the
  * derivation chain (`sbt "runMain graft.tools.GoldenGen"`), paste the
  * output into GoldenSpec, and say WHY the goldens moved in the commit. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "golden-gen")
    val routed = Pipeline.routedRecords(
      DataGen.sequences(spark, 10000L, 4), DataGen.routingRules)
    Sinks.routedChecksum(routed).orderBy("content_type")
      .collect().foreach { r =>
        println(s"""("${r.getString(0)}", ${r.getLong(1)}L, ${r.getLong(2)}L),""")
      }
    spark.stop()
  }
}
