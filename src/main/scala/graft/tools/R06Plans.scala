package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Round-6 deliverable: dump `explain("formatted")` for EVERY declared
  * query into plans/r06/<query>_<suffix>.txt (suffix "before"/"after").
  * Run at sf0.01 (plan shape is SF-independent); local[8] like Verify. */
object R06Plans {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.pipeline.GraftSession.builder("local[8]", 8, "r06plans")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get("plans/r06"))
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val s = fn(spark, sf).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"plans/r06/${name}_$suffix.txt"), s)
        println(s"[plans] $name ok")
      } catch { case e: Throwable =>
        println(s"[plans] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
