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
  val golden = Seq(
    ("Audit.AzureActiveDirectory", 172L, 3827133994550031286L),
    ("Audit.Exchange", 1526L, -7919346784665117830L),
    ("Audit.General", 1582L, 3194490064621105386L),
    ("Audit.SharePoint", 82L, -7904047849935283275L),
    ("DLP.All", 507L, -4875427309611748725L))

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
