package graft.util

import java.nio.file.{Files, Path, Paths}

/**
 * Scratch-space hygiene for benches, dev tools and specs.
 *
 * Round 3 lost its driver bench to the builder's own litter: per-iteration
 * temp output dirs were never deleted, accumulated ~80 GB across rounds,
 * filled the volume to 100%, and Spark died mid-stage creating shuffle temp
 * files ("temp_shuffle… No such file or directory"). Two rules prevent a
 * recurrence, both enforced here:
 *
 *  1. every tool-created output dir is deleted as soon as its timed work is
 *     done (deletion happens AFTER timing — the measured write still pays
 *     its full I/O cost);
 *  2. anything that will write gigabytes pre-flights a free-space check and
 *     fails with an explicit message instead of a cryptic shuffle error
 *     twenty stages in.
 */
object Scratch {

  /** Recursive delete; missing paths and races are fine (best-effort —
    * cleanup must never mask the real result of the work it follows). */
  def deleteRecursively(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { Files.deleteIfExists(f); () })
      }
    } catch { case _: Exception => () }

  def deleteRecursively(p: String): Unit = deleteRecursively(Paths.get(p))

  /** Create a temp dir under java.io.tmpdir, run `f` with its path, delete
    * it in a finally. The dir's lifetime is exactly the call. */
  def withTempDir[A](prefix: String)(f: String => A): A = {
    val dir = Files.createTempDirectory(prefix)
    try f(dir.toString) finally deleteRecursively(dir)
  }

  /**
   * Fail fast when the scratch volume can't absorb the run. `minBytes`
   * should be ~2x the expected peak scratch (outputs + shuffle spill) so a
   * concurrent writer can't sneak the volume to 0 mid-run.
   */
  def requireFreeSpace(minBytes: Long,
                       path: String = System.getProperty("java.io.tmpdir")): Unit = {
    val free = new java.io.File(path).getUsableSpace
    require(free >= minBytes,
      f"insufficient disk space on $path: ${free / 1e9}%.1f GB free, need >= " +
      f"${minBytes / 1e9}%.1f GB. A full volume kills Spark mid-stage with " +
      "'temp_shuffle... No such file or directory' and invalidates the whole " +
      "run - clear stale scratch dirs first.")
  }
}
