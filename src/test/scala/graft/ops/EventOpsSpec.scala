package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class EventOpsSpec extends SparkSuite {
  import spark.implicits._

  lazy val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").cache()

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize: planted gaps open sessions exactly; dense per-session positions") {
    val df = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 10:10:00")),  // 600s gap, same session
      (3L, 10L, ts("2024-01-01 11:00:01")),  // 3001s >= 1800 → new session
      (4L, 10L, ts("2024-01-01 11:30:01")),  // exactly 1800s → NEW session
      // (inclusive boundary = session_window's end-exclusive range, so the
      // native/streaming variants merge identically)
      (5L, 20L, ts("2024-01-01 10:00:00")))  // other user
      .toDF("event_id", "user_id", "ts")
    val got = EventOps.sessionize(df, "user_id", "ts", 1800, "event_id")
      .select("event_id", "session_seq", "session_pos")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Array(
      (1L, 0L, 0L), (2L, 0L, 1L), (3L, 1L, 0L), (4L, 2L, 0L), (5L, 0L, 0L)))
    // partition invariance
    val re = EventOps.sessionize(df.repartition(5), "user_id", "ts", 1800, "event_id")
      .select("event_id", "session_seq", "session_pos")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(re === got)
  }

  test("sessionWindowCounts ≡ sessionize's session set (native session_window agg)") {
    val counts = EventOps.sessionWindowCounts(events, "user_id", "ts", 1800)
      .select("user_id", "n_events").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val labeled = EventOps.sessionize(events, "user_id", "ts", 1800, "event_id")
      .groupBy("user_id", "session_seq").agg(count(lit(1)).as("n"))
      .select("user_id", "n").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(counts === labeled,
      "session_window must merge exactly like the lag/cumsum formulation")
  }

  test("funnel: strictly-ordered chains, partial prefixes, out-of-order events don't count") {
    val df = Seq(
      // user 1: full funnel in order
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // user 2: click BEFORE view → only step 1 counts
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      // user 3: view + click, no purchase → 2 steps; uses the EARLIEST
      // view (10:00), so the 10:30 click qualifies
      (3L, "view", ts("2024-01-01 10:00:00")),
      (3L, "view", ts("2024-01-01 11:00:00")),
      (3L, "click", ts("2024-01-01 10:30:00")),
      // user 4: never views → absent from the funnel
      (4L, "purchase", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = EventOps.funnel(df, "user_id", "ts",
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"))
      .select("user_id", "steps_completed").as[(Long, Long)].collect().sortBy(_._1)
    assert(got === Array((1L, 3L), (2L, 1L), (3L, 2L)))
    // same-instant events do NOT chain (strict >)
    val tie = Seq((9L, "view", ts("2024-01-01 10:00:00")),
      (9L, "click", ts("2024-01-01 10:00:00"))).toDF("user_id", "event_type", "ts")
    val tied = EventOps.funnel(tie, "user_id", "ts",
        Seq(col("event_type") === "view", col("event_type") === "click"))
      .select("steps_completed").as[Long].head()
    assert(tied === 1L)
  }

  test("asofJoinBackward ≡ brute-force latest-at-or-before; unmatched drop vs keep") {
    val left = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (2L, "a", ts("2024-01-01 11:00:00")),
      (3L, "a", ts("2024-01-01 09:00:00")),  // before any rate → unmatched
      (4L, "b", ts("2024-01-01 12:00:00")))
      .toDF("event_id", "event_type", "ts")
    val rates = Seq(
      ("a", ts("2024-01-01 09:30:00"), 1.0),
      ("a", ts("2024-01-01 10:00:00"), 2.0),  // same-instant tie → taken at 10:00
      ("a", ts("2024-01-01 10:30:00"), 3.0),
      ("b", ts("2024-01-01 00:00:00"), 9.0))
      .toDF("event_type", "rts", "rate")
    val inner = EventOps.asofJoinBackward(left, rates, "event_type", "ts", "rts", "rate")
      .select("event_id", "asof_value").as[(Long, Double)].collect().sortBy(_._1)
    assert(inner === Array((1L, 2.0), (2L, 3.0), (4L, 9.0)))
    val kept = EventOps.asofJoinBackward(left, rates, "event_type", "ts", "rts", "rate",
        keepUnmatched = true)
      .select("event_id", "asof_value").as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(kept.length === 4 && kept(2) === ((3L, None)))
    // a right row whose VALUE is null still supersedes older rows (DuckDB
    // ASOF returns the null) — it is a MATCH carrying null, never skipped
    val nullRates = Seq(("a", ts("2024-01-01 09:00:00"), Some(1.0)),
      ("a", ts("2024-01-01 10:30:00"), None: Option[Double]))
      .toDF("event_type", "rts", "rate")
    val gotNull = EventOps.asofJoinBackward(
        Seq((7L, "a", ts("2024-01-01 11:00:00"))).toDF("event_id", "event_type", "ts"),
        nullRates, "event_type", "ts", "rts", "rate")
      .select("event_id", "asof_value").as[(Long, Option[Double])].collect()
    assert(gotNull === Array((7L, None)),
      "the newest (null-valued) rate must win and the row must stay matched")
    // brute-force cross check on the real events table
    val ev = events.select("event_id", "event_type", "ts")
    val rt = events.filter(pmod(col("event_id"), lit(20)) === 0)
      .groupBy("event_type", "ts").agg(max("value").as("rate"))
      .withColumnRenamed("ts", "rts")
    val fast = EventOps.asofJoinBackward(ev, rt, "event_type", "ts", "rts", "rate")
      .select("event_id", "asof_value").as[(Long, Double)].collect().toMap
    val brute = ev.join(rt, Seq("event_type"))
      .filter(col("rts") <= col("ts"))
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("event_id").orderBy(col("rts").desc)))
      .filter(col("rn") === 1)
      .select("event_id", "rate").as[(Long, Double)].collect().toMap
    assert(fast === brute)
  }

  test("asofJoinBackward plan: one union-window pass, no range cross join") {
    val ev = events.select("event_id", "event_type", "ts")
    val rt = events.limit(50).select(col("event_type"), col("ts").as("rts"),
      col("value").as("rate"))
    val plan = EventOps.asofJoinBackward(ev, rt, "event_type", "ts", "rts", "rate")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"as-of must not fall back to a range cross join:\n$plan")
  }
}
