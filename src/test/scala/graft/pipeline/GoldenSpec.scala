package graft.pipeline

import graft.SparkSuite

/**
 * Committed goldens (FIXTURES.md §5): per-sink routed counts and
 * order-insensitive routed-row checksums for the deterministic 10k-row
 * fixture. These pin the ENTIRE derivation chain — token generation,
 * field parsing, rule filtering, routing, and the token-array-equality
 * invariant (the checksum hashes doc_id + tokens) — across Spark versions,
 * partitioning choices, and refactors. Any change to these numbers is a
 * semantic change, not a cleanup.
 */
class GoldenSpec extends SparkSuite {
  import spark.implicits._

  // (content_type, routed rows, bit_xor(xxhash64(doc_id, tokens)))
  // Regenerated 2026-08-16 (round 2): field derivations moved from
  // xxhash64 to the portable affine family (Parse.mix) so the flagship
  // pipeline is DuckDB-oracle-verifiable — an intentional semantic change.
  // Regenerate with `sbt "runMain graft.tools.GoldenGen"`.
  val golden = Seq(
    ("Audit.AzureActiveDirectory", 165L, 8144180900931128016L),
    ("Audit.Exchange", 1502L, -5745045514148631826L),
    ("Audit.General", 1703L, -5376458358276392L),
    ("Audit.SharePoint", 68L, -954214922889260194L),
    ("DLP.All", 499L, -1424666921826249088L))

  test("10k-row fixture matches committed per-sink counts and checksums") {
    val routed = Pipeline.routedRecords(
      DataGen.sequences(spark, 10000L, 4), DataGen.routingRules)
    val got = Sinks.routedChecksum(routed)
      .orderBy("content_type")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === golden)
  }

  test("goldens are partitioning-invariant") {
    val routed = Pipeline.routedRecords(
      DataGen.sequences(spark, 10000L, 7).repartition(13), DataGen.routingRules)
    val got = Sinks.routedChecksum(routed)
      .orderBy("content_type")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === golden)
  }
}
