package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-sequence operators over timestamped entity streams (the `events`
 * table shape: entity key + event time + payload): gap sessionization and
 * as-of (most-recent-value) joins — the two primitives every behavioral /
 * telemetry pipeline runs between ingestion and feature extraction.
 *
 * Scale shape, both operators: ONE exchange keyed on the entity column,
 * then per-entity window work bounded by that entity's OWN event count —
 * the inherently-sequential unit of both computations. A single entity
 * with 10^9 events would need upstream splitting (sessionize: pre-split on
 * coarse time buckets, re-merge boundary sessions); entity-count skew
 * (many small entities) is handled by AQE partition coalescing as usual.
 */
object EventOps {

  /**
   * Gap-based sessionization: a new session opens at an entity's first
   * event and whenever the gap since the previous event reaches
   * `gapSeconds` (inclusive — an event exactly gapSeconds after the
   * previous one starts a NEW session, matching Spark's end-exclusive
   * `session_window` range [start, last + gap), so [[sessionWindowCounts]]
   * and the streaming path merge identically). Adds:
   *
   *   session_seq  0-based session ordinal within the entity
   *   session_pos  0-based event ordinal within the session
   *
   * Deterministic: events order by (ts, tie-break column) so equal
   * timestamps never reshuffle sessions between runs/engines (the DuckDB
   * oracle reproduces the same lag + running-sum formulation).
   */
  def sessionize(df: DataFrame, entityCol: String, tsCol: String,
                 gapSeconds: Long, tieCol: String): DataFrame = {
    require(gapSeconds > 0)
    val wOrd = Window.partitionBy(entityCol).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(wOrd)
    // microsecond-exact gap compare (unix_timestamp truncates to seconds,
    // which would merge sessions whose gap straddles a second boundary;
    // the oracle uses DuckDB's epoch_us — identical arithmetic)
    // cast("timestamp"): parquet NTZ timestamps reach unix_micros as LTZ
    // (identity under the engine's pinned UTC session timezone)
    val boundary = when(prev.isNull ||
      unix_micros(col(tsCol).cast("timestamp")) -
        unix_micros(prev.cast("timestamp")) >= gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    val wRun = Window.partitionBy(entityCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withSeq = df.withColumn("__b", boundary)
      .withColumn("session_seq", sum(col("__b")).over(wRun) - 1)
    val wSess = Window.partitionBy(col(entityCol), col("session_seq"))
      .orderBy(col(tsCol), col(tieCol))
    withSeq
      .withColumn("session_pos", row_number().over(wSess) - lit(1).cast("long"))
      .drop("__b")
  }

  /**
   * Per-session aggregate via Spark's native `session_window` — identical
   * gap-merge semantics to [[sessionize]], and the SAME expression works
   * under Structured Streaming (watermark + session_window is the
   * streaming-native sessionization; StreamingPipelineSpec runs it with
   * late data). Returns (entity, session_start, session_end, n_events).
   */
  def sessionWindowCounts(df: DataFrame, entityCol: String, tsCol: String,
                          gapSeconds: Long): DataFrame =
    df.groupBy(col(entityCol), session_window(col(tsCol), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(entityCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /**
   * Ordered funnel analysis: for each entity, the earliest strictly-
   * increasing timestamp chain through `steps` (step k counts only AFTER
   * step k-1's earliest qualifying time — the standard conversion-funnel
   * semantics). Output: (entity, t_1..t_k nullable, steps_completed).
   *
   * Plan shape: one map-side-combining `min` aggregation per step over
   * the PRE-FILTERED step events (each a pushable predicate), chained by
   * equi-joins on the entity — k tiny aggregates, no per-entity event
   * window, no collect_list of event history. Entities that never reach
   * step 1 are absent (they completed 0 steps); later steps left-join so
   * partial funnels keep their prefix times.
   */
  def funnel(df: DataFrame, entityCol: String, tsCol: String,
             steps: Seq[Column]): DataFrame = {
    require(steps.nonEmpty)
    val s1 = df.filter(steps.head)
      .groupBy(col(entityCol)).agg(min(col(tsCol)).as("t_1"))
    val full = steps.zipWithIndex.drop(1).foldLeft(s1) { case (acc, (pred, i)) =>
      val k = i + 1
      val next = df.filter(pred)
        .join(acc.select(col(entityCol), col(s"t_$i").as("__prev")), entityCol)
        .filter(col(tsCol) > col("__prev"))
        .groupBy(col(entityCol)).agg(min(col(tsCol)).as(s"t_$k"))
      acc.join(next, Seq(entityCol), "left")
    }
    val completed = steps.indices.map(i => when(col(s"t_${i + 1}").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    full.withColumn("steps_completed", completed)
  }

  /**
   * Backward as-of join (SURVEY §2.3 J6 made first-class): each left row
   * picks the LATEST right row with `right.ts <= left.ts` for its key —
   * "the exchange rate / config / model version in effect at event time".
   *
   * Spark-first plan: no per-row range probe and no cross product — the
   * two sides UNION (right rows tagged 0, left 1), one exchange on the
   * key, and a per-key ordered window carries the most recent right
   * payload forward (`last(ignoreNulls)` over rows-between). Right rows
   * sort BEFORE left rows at equal timestamps, so the join is inclusive
   * (ties take the same-instant right row — DuckDB ASOF JOIN semantics,
   * which the oracle uses verbatim). Inner semantics: left rows before
   * any right row are dropped; pass `keepUnmatched = true` for the
   * left-join variant (null payload).
   *
   * Right sides are typically small dimension histories — but this plan
   * never assumes so: both sides shuffle once on the key, and a 10^10-row
   * right side costs the same exchange it would in any join.
   */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keyCol: String,
                       leftTsCol: String, rightTsCol: String,
                       valueCol: String, outCol: String = "asof_value",
                       keepUnmatched: Boolean = false): DataFrame = {
    val leftCols = left.columns
    // the plan builds through fixed temp columns; an input that already
    // carries one of these names would be silently overwritten and dropped
    // case-INSENSITIVE compare: Spark resolves columns case-insensitively
    // by default, so a user column "__TS" clashes with withColumn("__ts")
    // all the same
    val reserved = Seq("__ts", "__tag", "__v", "__last", "__matched")
    val clash = (left.columns ++ right.columns)
      .filter(c => reserved.exists(_.equalsIgnoreCase(c)))
    require(clash.isEmpty,
      s"asofJoinBackward: input columns ${clash.mkString(", ")} collide with " +
      s"reserved temp names (${reserved.mkString(", ")}) — rename them first")
    val vType = right.schema(valueCol).dataType
    // the carried payload is a STRUCT (marker, value): ignoreNulls must
    // skip only LEFT rows' placeholder, never a right row whose value is
    // genuinely NULL — a null rate at t5 supersedes the t1 rate (DuckDB
    // ASOF returns the null), and match/no-match is decided by the
    // struct's presence, not the value's nullness
    val l = left
      .withColumn("__ts", col(leftTsCol))
      .withColumn("__tag", lit(1))
      .withColumn("__v",
        lit(null).cast(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v", vType)))))
    val r = right.select(
      col(keyCol),
      col(rightTsCol).as("__ts"),
      lit(0).as("__tag"),
      struct(col(valueCol).as("v")).as("__v"))
    val rPadded = leftCols.filterNot(c => c == keyCol)
      .foldLeft(r)((acc, c) => acc.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(l.columns.map(col): _*)
    val w = Window.partitionBy(keyCol).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(rPadded)
      .withColumn("__last", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .withColumn(outCol, col("__last.v"))
      .withColumn("__matched", col("__last").isNotNull)
      .drop("__ts", "__tag", "__v", "__last")
    val out = if (keepUnmatched) joined else joined.filter(col("__matched"))
    out.drop("__matched")
  }
}
