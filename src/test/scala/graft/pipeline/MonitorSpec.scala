package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MonitorSpec extends SparkSuite {
  import spark.implicits._

  test("secret masking keeps last 5 chars behind stars") {
    val got = Seq("supersecretvalue", "tiny").toDF("s")
      .select(Monitor.maskSecret(col("s"))).as[String].collect()
    assert(got(0) === "********value")
    assert(got(1) === "tiny")
  }

  test("progress: reference formula computes remaining; corrected computes progress") {
    val df = Seq((200L, 50L)).toDF("found", "successful")
    val (ref, fixed) = df.select(
      Monitor.progressPctReference(col("found"), col("successful")),
      Monitor.progressPct(col("found"), col("successful")))
      .as[(Int, Int)].head()
    assert(ref === 75)   // (200-50)/200*100 — "remaining", the reference bug
    assert(fixed === 25) // 50/200
  }

  test("chart scale picks the max counter") {
    val got = Seq((10L, 8L, 3L, 99L)).toDF("f", "s", "r", "e")
      .select(Monitor.chartScale(col("f"), col("s"), col("r"), col("e")))
      .as[Long].head()
    assert(got === 99L)
  }

  test("speed series yields positive rolling rates on parsed records") {
    val parsed = Parse.deriveFields(DataGen.sequences(spark, 2000L, 4))
    val speed = Monitor.speedSeries(parsed, "CreationTime", windowRows = 50)
    assert(speed.filter(col("rows_per_sec") < 0).count() === 0)
    assert(speed.filter(col("rows_per_sec").isNotNull).count() > 0)
  }

  test("lastN and columnSlice bound the interactive view") {
    val parsed = Parse.deriveFields(DataGen.sequences(spark, 500L, 2))
    assert(Monitor.lastN(parsed, "CreationTime", 100).count() === 100)
    val sliced = Monitor.columnSlice(parsed, 1, 3)
    assert(sliced.columns.length === 3)
  }
}
