package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Real CSV file sink with the reference's two modes
 * (src/interfaces/file_interface.rs):
 *
 *  - unified (S4): one CSV, columns = union of all record keys, missing
 *    values padded "" (:64-86, fill_log :138-148)
 *  - separated (S5): one CSV per content type, file named
 *    `{yyyyMMddHHmmss}_{stem}_{ContentTypeWithoutDots}.csv` next to the
 *    configured path (:34-56); empty types skipped (:92-94)
 *
 * Spark writes a DIRECTORY of part files per logical CSV — the
 * distributed-engine equivalent of the reference's single file (coalesce
 * to taste; at 100 TB one file per type is exactly what you don't want).
 * Column order is deterministic (sorted) where the reference's was
 * first-seen map order (SURVEY.md §2.6 O3 — an improvement, pinned here).
 */
object CsvSink {

  /** Union-schema flattening shared by the CSV writers and the file-sink
    * shape: complex columns to JSON strings (tokens via the codegen'd
    * int_array_json ≡ to_json), deterministic sorted column order,
    * missing values padded "". */
  private[pipeline] def flatten(df: DataFrame): DataFrame = {
    val flat = df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType if f.name == "tokens" =>
          acc.withColumn(f.name, graft.functions.GraftFunctions.int_array_json(col(f.name)))
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.StructType |
             _: org.apache.spark.sql.types.MapType =>
          acc.withColumn(f.name, to_json(col(f.name)))
        case _ => acc
      }
    }
    val ordered = flat.columns.sorted.map(col)
    flat.select(ordered: _*).na.fill("")
  }

  /** Unified mode: all content types, one CSV directory. */
  def writeUnified(df: DataFrame, path: String, separator: String = ","): Unit =
    flatten(df).write.mode("overwrite")
      .option("header", "true").option("sep", separator)
      .csv(path)

  /**
   * Separated mode: one CSV directory per content type present, named with
   * the reference's postfix scheme. `configuredPath` plays the role of the
   * config's output.file.path ("output.csv" → stem "output").
   *
   * ONE pass over the input: a single `partitionBy` write splits the types
   * (content_type is duplicated into the partition column so it also stays
   * in the file payload, matching unified mode), then the partition
   * directories are renamed to the reference's naming. Types with no rows
   * produce no directory — the reference's skip-empty behavior
   * (src/interfaces/file_interface.rs:92-94) — instead of the old
   * discover-distinct scan + one filtered pass per type.
   */
  def writeSeparated(df: DataFrame, configuredPath: String, separator: String = ",",
                     postfix: String = timestampPostfix()): Seq[String] = {
    val p = java.nio.file.Paths.get(configuredPath)
    val dir = Option(p.getParent).map(_.toString).getOrElse(".")
    val stem = p.getFileName.toString.stripSuffix(".csv")
    val tmp = s"$dir/.${stem}_${postfix}_parts"
    flatten(df).withColumn("__ct_part", col("content_type"))
      .write.mode("overwrite")
      .partitionBy("__ct_part")
      .option("header", "true").option("sep", separator)
      .csv(tmp)
    val partDirs = Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("__ct_part="))
      .sortBy(_.getName)
    val out = partDirs.map { d =>
      // partition values are Hive-escaped in directory names — use Spark's
      // exact inverse (URLDecoder is NOT it: it turns '+' into a space and
      // throws on a stray '%' that isn't a valid hex escape)
      val raw = d.getName.stripPrefix("__ct_part=")
      val ct =
        if (raw == org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
          "null" // null/empty content_type — keep a readable filename
        else
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(raw)
      val target = java.nio.file.Paths.get(
        s"$dir/${postfix}_${stem}_${ct.replace(".", "")}.csv")
      if (java.nio.file.Files.exists(target)) {
        java.nio.file.Files.walk(target)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
      }
      java.nio.file.Files.move(d.toPath, target)
      target.toString
    }.toSeq
    // tmp now holds only _SUCCESS markers
    java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(f => java.nio.file.Files.deleteIfExists(f))
    out
  }

  def timestampPostfix(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())

  /** Read back a CSV directory written by this sink (header on). */
  def read(spark: SparkSession, path: String, separator: String = ","): DataFrame =
    spark.read.option("header", "true").option("sep", separator).csv(path)
}
