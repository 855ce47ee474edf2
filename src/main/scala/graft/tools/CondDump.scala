package graft.tools
import org.apache.spark.sql.functions._
import graft.pipeline._
object CondDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(2, "cond")
    val full = Pipeline.routedRecords(DataGen.sequences(spark, 1000L, 2), DataGen.routingRules)
      .groupBy("content_type", "operation").count()
    val plan = full.queryExecution.executedPlan.toString
    val cond = plan.split("\n").filter(_.contains("Filter")).mkString("\n")
    println("FILTERLEN=" + cond.length)
    for (tok <- Seq("docidnumexpr", "gentokensexpr", "date_format", "element_at", "pmod")) {
      println(s"COUNT $tok = " + tok.r.findAllIn(cond.toLowerCase).size)
    }
    println(cond.take(3000))
    spark.stop()
  }
}
