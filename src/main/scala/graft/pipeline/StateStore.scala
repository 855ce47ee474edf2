package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/**
 * Iceberg-shaped snapshot state store for the known-content dedup state
 * (reference: `known_blobs` line file, src/config.rs:58-119 load/save;
 * inserted at src/collector.rs:161, checked at src/api_connection.rs:341-343).
 *
 * The sandbox ships no Iceberg runtime, so snapshot semantics are provided
 * directly: each commit writes one immutable parquet DELTA directory
 * `snapshot-N/` (only the new ids — O(batch), not O(state), exactly like an
 * Iceberg fast-append manifest) and atomically swaps a `_CURRENT` pointer
 * file (write-temp + ATOMIC_MOVE — the pointer-swap Iceberg's
 * HadoopTableOperations does with `version-hint.text`). The live table is
 * the union of snapshots 0..N. `compact()` folds the deltas into one
 * snapshot when the chain grows long. On a production cluster this class is
 * the one seam to replace with `spark.read/writeTo("cat.db.known_content")`.
 *
 * Resume contract (north rule; SURVEY.md §7.3): state is committed strictly
 * AFTER the durable sink write of the same batch. A job killed between sink
 * write and state commit re-writes that batch on resume into overwritten
 * output paths (idempotent), never skips data, and the anti-join absorbs all
 * previously committed rows — resume-without-re-emission of *committed* rows.
 * (The reference is weaker: it saves state only at run end and records blobs
 * as known even when parsing failed, src/collector.rs:161-171.)
 */
class StateStore(val dir: String) {
  private val currentPtr = Paths.get(dir, "_CURRENT")

  /** Highest committed snapshot id, if any. */
  def currentSnapshot: Option[Int] =
    if (Files.exists(currentPtr))
      Some(new String(Files.readAllBytes(currentPtr), StandardCharsets.UTF_8).trim.toInt)
    else None

  private def snapshotPath(n: Int) = s"$dir/snapshot-$n"

  /** Statically-empty relation (LocalRelation, not an RDD): Catalyst's
    * PropagateEmptyRelation then eliminates the dedup anti-join entirely on
    * a first run — an emptyRDD-backed relation has unknown stats and would
    * force a full shuffle join of the input against nothing. */
  private def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      Schemas.knownContent)

  /** All live delta paths as of the current snapshot. */
  private def livePaths: Seq[String] =
    currentSnapshot match {
      case Some(n) => (0 to n).map(snapshotPath).filter(p => Files.exists(Paths.get(p)))
      case None    => Nil
    }

  /**
   * Load live (non-expired) state: union of all committed deltas. Mirrors
   * the reference's load-time expiry filter (src/config.rs:92-106): entries
   * whose expiration <= now are dropped at load.
   */
  def load(spark: SparkSession, nowEpochSec: Long): DataFrame = {
    val paths = livePaths
    if (paths.isEmpty) emptyState(spark)
    else spark.read.parquet(paths: _*)
      .filter(col("expiration") > timestamp_seconds(lit(nowEpochSec)))
  }

  /**
   * Dedup: anti-join incoming rows against known content ids
   * (SURVEY.md §2.3 J1 — the reference's `known_blobs.contains_key` probe
   * IS a broadcast hash anti-join). While state is small Catalyst/AQE picks
   * BroadcastHashJoin; at 10^12-scale state it degrades gracefully to a
   * shuffled hash/sort-merge anti-join on the id — no code change.
   */
  def dedup(incoming: DataFrame, known: DataFrame, idCol: String = "doc_id"): DataFrame =
    incoming.join(
      known.select(col("content_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /**
   * Commit: write `newlyRouted` ids as delta snapshot N+1, atomically swap
   * the pointer. Per-partition lineage is recorded on every row
   * (partition_id = the task that emitted it, committed_at = the commit
   * watermark) per the north rule's checkpoint/lineage requirement.
   * Crash before the pointer swap leaves an orphan directory that is never
   * referenced — commits are all-or-nothing.
   */
  def commit(spark: SparkSession, newlyRouted: DataFrame, idCol: String,
             expirationEpochSec: Long, commitEpochSec: Long): Int = {
    val next = currentSnapshot.getOrElse(-1) + 1
    newlyRouted
      .select(
        col(idCol).cast("string").as("content_id"),
        timestamp_seconds(lit(expirationEpochSec)).as("expiration"),
        timestamp_seconds(lit(commitEpochSec)).as("committed_at"),
        spark_partition_id().as("partition_id"))
      .write.mode("overwrite").parquet(snapshotPath(next))
    swapPointer(next)
    next
  }

  /** Fold all deltas into a single snapshot (Iceberg `rewrite_data_files`
    * analog) — run periodically so `load` unions O(1) directories. */
  def compact(spark: SparkSession): Unit = currentSnapshot.foreach { n =>
    val merged = spark.read.parquet(livePaths: _*)
    merged.write.mode("overwrite").parquet(snapshotPath(n + 1))
    swapPointer(n + 1)
    (0 to n).foreach { i =>
      val p = Paths.get(snapshotPath(i))
      if (Files.exists(p)) {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
      }
    }
  }

  private def swapPointer(next: Int): Unit = {
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, s"_CURRENT.tmp$next")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentPtr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
