package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM; sbt forks once). */
object SparkSuite {
  // Every temp dir any suite creates is registered here and deleted when the
  // test JVM exits — spec litter (state stores, sink outputs, streaming
  // checkpoints) otherwise accumulates across rounds and filled the disk in
  // round 3 (see graft.util.Scratch). Deletion is best-effort and happens at
  // exit, so tests keep their dirs for their whole lifetime.
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def track(dir: String): String = { created.add(dir); dir }

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach(d => graft.util.Scratch.deleteRecursively(d))
  }))

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(graft.plans.GraftExtensions) // same rules as GraftSession
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        track(java.nio.file.Files.createTempDirectory("graft_wh").toString))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.spark
  def tmpDir(prefix: String): String =
    SparkSuite.track(java.nio.file.Files.createTempDirectory(prefix).toString)
}
