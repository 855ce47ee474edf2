package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ParseSpec extends SparkSuite {
  import spark.implicits._

  lazy val seqs = DataGen.sequences(spark, 2000L, 4).cache()
  lazy val parsed = Parse.deriveFields(seqs).cache()

  test("generator is deterministic and well-formed") {
    val a = DataGen.sequences(spark, 100L, 2)
    val b = DataGen.sequences(spark, 100L, 4) // different parallelism
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "generation must not depend on partitioning")
    val bad = a.filter(col("n_tok") =!= size(col("tokens")) ||
      col("n_tok") < 16 || col("n_tok") > 256 ||
      exists(col("tokens"), t => t < 0 || t >= DataGen.Vocab)).count()
    assert(bad === 0)
  }

  test("derived fields land in their vocabularies") {
    assert(parsed.filter(!col("content_type").isin(Schemas.ContentTypes: _*)).count() === 0)
    assert(parsed.filter(!col("workload").isin(Schemas.Workloads: _*)).count() === 0)
    assert(parsed.filter(!col("operation").isin(Schemas.Operations: _*)).count() === 0)
    assert(parsed.filter(col("record_type") < 0 || col("record_type") >= 64).count() === 0)
  }

  test("content-type distribution is skewed with a dominant type") {
    val counts = parsed.groupBy("content_type").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet === Schemas.ContentTypes.toSet)
    val dom = counts("Audit.General").toDouble / counts.values.sum
    assert(dom > 0.4 && dom < 0.6, s"dominant share $dom should be ~0.5")
  }

  test("Policy is absent on some Audit.General rows (absent-key fixture)") {
    val gen = parsed.filter(col("content_type") === "Audit.General")
    val absent = gen.filter(col("Policy").isNull).count()
    assert(absent > 0 && absent < gen.count())
    // non-General rows never carry Policy
    assert(parsed.filter(col("content_type") =!= "Audit.General" &&
      col("Policy").isNotNull).count() === 0)
  }

  test("CreationTime parses in the reference's format and spans 168h") {
    val ts = parsed.select(to_timestamp(col("CreationTime"), "yyyy-MM-dd'T'HH:mm:ss").as("t"))
    assert(ts.filter(col("t").isNull).count() === 0)
    val mm = ts.agg(min("t").cast("long"), max("t").cast("long")).as[(Long, Long)].head()
    assert(mm._1 >= Parse.BaseEpoch && mm._2 < Parse.BaseEpoch + Parse.SpanSeconds)
  }

  test("grok/regex extraction round-trips the derived fields") {
    val grokked = Parse.grokExtract(Parse.renderLogLine(parsed))
    val mismatches = grokked.filter(
      col("g_CreationTime") =!= col("CreationTime") ||
      col("g_content_type") =!= col("content_type") ||
      col("g_workload") =!= col("workload") ||
      col("g_operation") =!= col("operation") ||
      col("g_record_type") =!= col("record_type") ||
      col("g_doc_id") =!= col("doc_id")).count()
    assert(mismatches === 0)
  }

  test("token arrays pass through parse untouched (north-rule invariant)") {
    val before = seqs.select(col("doc_id"), xxhash64(col("doc_id"), col("tokens")).as("h"))
    val after = parsed.select(col("doc_id"), xxhash64(col("doc_id"), col("tokens")).as("h"))
    assert(before.exceptAll(after).isEmpty && after.exceptAll(before).isEmpty)
  }
}
