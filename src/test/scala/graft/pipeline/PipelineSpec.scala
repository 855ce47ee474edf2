package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSuite {
  import spark.implicits._

  test("end-to-end run: counts reconcile and sinks are consistent") {
    val out = tmpDir("pipe")
    val seqs = DataGen.sequences(spark, 5000L, 4)
    val res = Pipeline.run(spark, seqs, out)
    val st = res.stats
    assert(st.rowsIn === 5000L)
    assert(st.rowsDeduped === 0L)           // fresh state
    assert(st.rowsDroppedByFilter > 0)
    assert(st.rowsQuarantined === 0L)
    assert(st.rowsRouted === st.rowsIn - st.rowsDeduped - st.rowsDroppedByFilter)

    // All record-level sinks carry exactly the routed rows
    val csv = spark.read.parquet(s"$out/file_csv")
    val graylog = spark.read.parquet(s"$out/graylog")
    val fluentd = spark.read.parquet(s"$out/fluentd")
    val oms = spark.read.parquet(s"$out/log_analytics")
    assert(csv.count() === st.rowsRouted)
    assert(graylog.count() === st.rowsRouted) // all CreationTimes parse
    assert(fluentd.count() === st.rowsRouted)
    assert(oms.count() === st.rowsRouted)

    // PRTG sensor counts sum to routed rows
    val prtg = spark.read.parquet(s"$out/prtg")
    assert(prtg.agg(sum("cnt")).as[Long].head() === st.rowsRouted)

    // per-partition metrics (north rule): per-stage sums reconcile
    val metrics = spark.read.parquet(s"$out/metrics")
    def stageSum(s: String) = metrics.filter(col("stage") === s)
      .agg(coalesce(sum("rows"), lit(0L))).as[Long].head()
    assert(stageSum("routed") === st.rowsRouted)
    assert(stageSum("parsed") === st.rowsIn - st.rowsDeduped)
    assert(stageSum("dropped_by_filter") === st.rowsDroppedByFilter)
    assert(stageSum("quarantined") === st.rowsQuarantined)
    assert(stageSum("filtered") === stageSum("routed") + stageSum("quarantined"))
  }

  test("malformed doc ids are quarantined end to end, never dropped or binned") {
    val out = tmpDir("pipe_malformed")
    val good = DataGen.sequences(spark, 200L, 2)
    // digit-free suffix AND a digit-prefix-then-junk id: both must null-gate
    // (the latter would parse as id 7 under stop-at-first-non-digit)
    val bad = good.limit(1).withColumn("doc_id", lit("doc-7garbage1234"))
      .unionByName(good.limit(1).withColumn("doc_id", lit("doc-nodigits-here")))
    val res = Pipeline.run(spark, good.unionByName(bad), out)
    assert(res.stats.rowsQuarantined === 2,
      s"stats: ${res.stats}")
    val quarantine = spark.read.parquet(s"$out/quarantine")
    assert(quarantine.select("doc_id").as[String].collect().sorted ===
      Array("doc-7garbage1234", "doc-nodigits-here"))
    // quarantined rows have NULL audit fields (null-gated, not binned) …
    assert(quarantine.filter(col("content_type").isNotNull).count() === 0)
    // … and appear in NO record sink (fluentd nests the row under `record`;
    // log_analytics carries it as a JSON body string)
    def leaked(dir: String, idCol: org.apache.spark.sql.Column) =
      spark.read.parquet(s"$out/$dir")
        .filter(idCol.contains("doc-7garbage") || idCol.contains("doc-nodigits"))
        .count()
    assert(leaked("file_csv", col("doc_id")) === 0, "file_csv leaked")
    assert(leaked("graylog", col("doc_id")) === 0, "graylog leaked")
    assert(leaked("fluentd", col("record.doc_id")) === 0, "fluentd leaked")
    assert(leaked("log_analytics", col("body")) === 0, "log_analytics leaked")
  }

  test("targetRowsPerFile sizes record-sink outputs (small-files bound)") {
    val out = tmpDir("pipe_sized")
    val res = Pipeline.run(spark, DataGen.sequences(spark, 5000L, 8), out,
      Pipeline.Config(targetRowsPerFile = 500L))
    val routed = res.stats.rowsRouted
    val wantParts = ((routed + 499) / 500).toInt
    def partFiles(dir: String) =
      Option(new java.io.File(s"$out/$dir").listFiles()).getOrElse(Array.empty)
        .count(f => f.getName.startsWith("part-"))
    // plain record sinks: exactly ceil(routed / target) files
    assert(partFiles("graylog") === wantParts, s"graylog: ${partFiles("graylog")}")
    assert(partFiles("fluentd") === wantParts)
    // tiny operational aggregates collapse to one file
    assert(partFiles("prtg") === 1)
    assert(partFiles("checksums") === 1)
    assert(partFiles("metrics") === 1)
    // and the data is intact
    assert(spark.read.parquet(s"$out/graylog").count() === routed)
  }

  test("token arrays survive end to end (north-rule invariant) incl. CSV round-trip") {
    val out = tmpDir("pipe_tok")
    val seqs = DataGen.sequences(spark, 2000L, 4)
    Pipeline.run(spark, seqs, out)
    val expected = Pipeline.routedRecords(seqs, DataGen.routingRules)
      .select(col("doc_id"), col("tokens"))
    // fluentd sink keeps the typed record struct
    val fluentd = spark.read.parquet(s"$out/fluentd")
      .select(col("record.doc_id").as("doc_id"), col("record.tokens").as("tokens"))
    assert(expected.exceptAll(fluentd).isEmpty && fluentd.exceptAll(expected).isEmpty)
    // CSV sink serialized tokens as JSON — parse back and compare
    val csv = spark.read.parquet(s"$out/file_csv")
      .select(col("doc_id"),
        from_json(col("tokens"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType)).as("tokens"))
    assert(expected.exceptAll(csv).isEmpty && csv.exceptAll(expected).isEmpty)
  }

  test("routed-row checksum is invariant under repartitioning") {
    val seqs = DataGen.sequences(spark, 2000L, 4)
    val routed = Pipeline.routedRecords(seqs, DataGen.routingRules)
    val a = Sinks.routedChecksum(routed)
    val b = Sinks.routedChecksum(routed.repartition(17))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("dedup: second run over the same input routes zero rows (idempotence)") {
    val out = tmpDir("pipe_dedup")
    val seqs = DataGen.sequences(spark, 1000L, 2)
    val r1 = Pipeline.run(spark, seqs, out)
    assert(r1.stats.rowsRouted > 0)
    val r2 = Pipeline.run(spark, seqs, out)
    assert(r2.stats.rowsDeduped === 1000L,
      "every input row was committed (routed or filtered) in run 1")
    assert(r2.stats.rowsRouted === 0L)
  }

  test("resume: overlapping window re-run emits each row exactly once") {
    val out = tmpDir("pipe_resume")
    val first = DataGen.sequences(spark, 1000L, 2)
    val r1 = Pipeline.run(spark, first, out)
    // second run sees an overlapping superset (late-data re-scan, ST4)
    val superset = DataGen.sequences(spark, 1500L, 2)
    val r2 = Pipeline.run(spark, superset, out)
    assert(r2.stats.rowsDeduped === 1000L)
    val total = r1.stats.rowsRouted + r2.stats.rowsRouted
    val fresh = tmpDir("pipe_fresh")
    val all = Pipeline.run(spark, DataGen.sequences(spark, 1500L, 2), fresh)
    assert(total === all.stats.rowsRouted, "resume ≡ fresh run over the union")
  }

  test("quarantine captures unknown content types instead of silent drop") {
    val out = tmpDir("pipe_quar")
    val seqs = DataGen.sequences(spark, 200L, 2)
    // corrupt the parse: force an unknown type on some rows
    val parsed = Parse.deriveFields(seqs).withColumn("content_type",
      when(pmod(xxhash64(col("doc_id")), lit(5)) === 0, lit("Audit.Bogus"))
        .otherwise(col("content_type")))
    val routed = Route.routed(parsed)
    val quar = Route.quarantined(parsed)
    assert(quar.count() > 0)
    assert(routed.count() + quar.count() === 200L)
    assert(routed.filter(col("OriginFeed") =!= col("content_type")).count() === 0)
  }

  test("flagship entry returns per-type counts > 0") {
    val df = graft.SparkEntry.entry(spark)
    val rows = df.as[(String, Long)].collect().toMap
    assert(rows.nonEmpty && rows.values.forall(_ > 0))
  }
}
