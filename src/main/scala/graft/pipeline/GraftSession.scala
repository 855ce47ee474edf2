package graft.pipeline

import org.apache.spark.sql.SparkSession

/**
 * Session factory with the engine's recommended configuration — one place
 * for the scale-sensitive knobs, used by the harness mains and documented
 * for cluster deployment (spark-submit --conf equivalents).
 */
object GraftSession {

  def builder(master: String, cores: Int, appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      // engine optimizer rules (e.g. FuseJaccardCounts) — the
      // SparkSessionExtensions seam; equivalent spark-submit conf:
      // --conf spark.sql.extensions=graft.plans.GraftExtensions
      .withExtensions(graft.plans.GraftExtensions)
      // shuffle partitions sized to cores in local mode; on a real cluster
      // start at 2-3x total executor cores and let AQE coalesce
      .config("spark.sql.shuffle.partitions", cores)
      // AQE: runtime re-planning — join strategy switches, partition
      // coalescing, and skew-join splitting (north rule)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // oracle parity + deterministic goldens
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val s = builder(s"local[$cores]", cores, appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
