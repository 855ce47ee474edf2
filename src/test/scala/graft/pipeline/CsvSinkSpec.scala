package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CsvSinkSpec extends SparkSuite {
  import spark.implicits._

  lazy val routed = Pipeline.routedRecords(
    DataGen.sequences(spark, 1000L, 4), DataGen.routingRules).cache()

  test("unified CSV round-trips rows with union schema and \"\" padding") {
    val out = tmpDir("csv_uni") + "/all.csv"
    CsvSink.writeUnified(routed, out, separator = ";")
    val back = CsvSink.read(spark, out, separator = ";")
    assert(back.count() === routed.count())
    assert(back.columns.toSeq === routed.columns.sorted.toSeq)
    // null Policy was padded to "" in the file; Spark's CSV reader maps the
    // empty field back to null, so the null set must equal the original
    assert(back.filter(col("Policy").isNull).count() ===
      routed.filter(col("Policy").isNull).count())
    val tok = back.select(col("doc_id"),
      from_json(col("tokens"), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType)).as("tokens"))
    val expected = routed.select("doc_id", "tokens")
    assert(tok.exceptAll(expected).isEmpty && expected.exceptAll(tok).isEmpty)
  }

  test("separated CSV: one timestamped file set per content type, dots stripped") {
    val dir = tmpDir("csv_sep")
    val paths = CsvSink.writeSeparated(routed, s"$dir/output.csv",
      separator = ";", postfix = "20260101000000")
    val present = routed.select("content_type").distinct().count()
    assert(paths.size === present)
    assert(paths.forall(p => p.contains("20260101000000_output_")))
    assert(paths.exists(_.endsWith("_AuditGeneral.csv")))
    // per-type files contain exactly that type's rows
    val general = CsvSink.read(spark, paths.find(_.contains("AuditGeneral")).get, ";")
    assert(general.select("content_type").distinct().as[String].collect()
      === Array("Audit.General"))
    val total = paths.map(p => CsvSink.read(spark, p, ";").count()).sum
    assert(total === routed.count())
  }

  test("separated CSV: user-supplied types with '+', '%' and ':' unescape exactly") {
    // '+' is NOT URL-safe (URLDecoder turned it into a space) and '%'/':'
    // are Hive-escaped in partition dir names — unescapePathName is the
    // exact inverse, so the reference's filename scheme survives any type
    val df = Seq(
      ("doc-1", "A+B.C"), ("doc-2", "100%ile"), ("doc-3", "a:b")
    ).toDF("doc_id", "content_type")
    val dir = tmpDir("csv_sep_esc")
    val paths = CsvSink.writeSeparated(df, s"$dir/out.csv",
      postfix = "20260101000000")
    assert(paths.exists(_.endsWith("_A+BC.csv")), paths.mkString(", "))
    assert(paths.exists(_.endsWith("_100%ile.csv")), paths.mkString(", "))
    assert(paths.exists(_.endsWith("_a:b.csv")), paths.mkString(", "))
    val back = CsvSink.read(spark, paths.find(_.contains("A+BC")).get)
    assert(back.select("content_type").as[String].collect() === Array("A+B.C"))
  }
}
