package graft.pipeline

import graft.SparkSuite

class WindowsSpec extends SparkSuite {

  val end = Parse.BaseEpoch + 7 * 24 * 3600

  test("windows are <=24h, contiguous, and cover exactly hoursToCollect") {
    for (hours <- Seq(1, 23, 24, 25, 48, 167, 168)) {
      val w = Windows.plan(end, hours)
      assert(w.head._1 === end - hours * 3600L)
      assert(w.last._2 === end)
      assert(w.forall { case (s, e) => e - s <= 24 * 3600L && e > s })
      assert(w.sliding(2).forall {
        case Seq((_, e1), (s2, _)) => e1 === s2
        case _ => true
      })
      assert(w.map(x => x._2 - x._1).sum === hours * 3600L)
    }
  }

  test("hoursToCollect beyond 168h is rejected (reference panics)") {
    intercept[IllegalArgumentException](Windows.plan(end, 169))
    intercept[IllegalArgumentException](Windows.plan(end, 0))
  }

  test("readWindow enforces exact record bounds on non-day-aligned windows") {
    import org.apache.spark.sql.functions._
    val out = tmpDir("win_unaligned")
    val parsed = Parse.deriveFields(DataGen.sequences(spark, 2000L, 4))
    Windows.writePartitionedByWindow(parsed, "CreationTime", s"$out/tbl")
    // 07:00 on day 2 .. 05:00 on day 4 — both bounds mid-day
    val start = Parse.BaseEpoch + 86400 + 7 * 3600
    val stop = Parse.BaseEpoch + 3 * 86400 + 5 * 3600
    val slice = Windows.readWindow(spark, s"$out/tbl", start, stop)
    val ts = to_timestamp(col("CreationTime"), "yyyy-MM-dd'T'HH:mm:ss")
    val expected = parsed.filter(
      ts >= timestamp_seconds(lit(start)) && ts < timestamp_seconds(lit(stop)))
    assert(expected.count() > 0)
    assert(slice.count() === expected.count(),
      "day-granular pruning must not leak earlier rows or drop the partial last day")
  }

  test("planDf agrees with the Scala plan for every content type") {
    val hours = 100
    val expected = Windows.plan(end, hours)
    val df = Windows.planDf(spark, Schemas.ContentTypes, end, hours)
    assert(df.count() === expected.size * Schemas.ContentTypes.size)
    import org.apache.spark.sql.functions._
    val got = df.filter(col("content_type") === Schemas.ContentTypes.head)
      .select(col("window_start").cast("long"), col("window_end").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq === expected)
  }
}
