package graft.util

import org.apache.spark.sql.DataFrame

/**
 * Scan-parallelism floor (guide §2.5 "input skew" / §6 input splits).
 *
 * The similarity/dedup operators do their heavy per-row work (signature
 * kernels, BNLJ cosine scoring) in the SCAN stage of their input — before
 * any exchange restores parallelism. A small input that arrives as one or
 * two unsplittable parquet row groups therefore runs that stage on one
 * core, whatever the cluster size: at sf0.1 the 2 000-row embeddings table
 * is a single file, and the brute-force scorer measured 2.99 s single-task
 * vs 0.27 s repartitioned at local[32] (R06Measure).
 *
 * `ensure` floors a *scan-shaped* input's partitioning at the session
 * default parallelism. It is deliberately conservative so it can never
 * hurt at scale:
 *
 *  - only fires when the physical plan contains NO exchange (a pure
 *    scan/projection lineage — inspecting it runs zero jobs; plans that
 *    already shuffle get their parallelism from the shuffle, and forcing
 *    their RDD here could trigger AQE stage execution at plan time);
 *  - only fires when the planned partition count is below the session
 *    default parallelism — at 100 TB a corpus scan has orders of magnitude
 *    more splits than cores, so this is a no-op and no repartition
 *    exchange is ever added;
 *  - the added exchange, when it does fire, is a round-robin repartition
 *    of an input that is by construction small (fewer splits than cores).
 */
object Par {

  def ensure(df: DataFrame): DataFrame = ensure(df, Int.MaxValue)

  /** `cap` bounds the floored parallelism — for inputs KNOWN to be tiny
    * (k-means training samples) where full-width repartitioning would buy
    * a few hundred rows per task and pay exchange + scheduling overhead
    * on every downstream pass instead. */
  def ensure(df: DataFrame, cap: Int): DataFrame = {
    val target = math.min(cap.toLong,
      df.sparkSession.sparkContext.defaultParallelism.toLong).toInt
    if (target <= 1) return df
    val plan = df.queryExecution.sparkPlan
    val hasExchange = plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange])
    if (hasExchange) df
    else if (df.queryExecution.toRdd.getNumPartitions < target)
      df.repartition(target)
    else df
  }
}
