package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

class FilterStageSpec extends SparkSuite {
  import spark.implicits._

  // Hand-built rows pinning the reference's exact semantics
  // (src/collector.rs:176-184): (doc_id, content_type, Policy, operation)
  lazy val rows = Seq(
    ("d1", "Audit.General", "Spoof", "SendAs"),          // matches rule → pass
    ("d2", "Audit.General", "Phish", "SendAs"),          // key present, != → drop
    ("d3", "Audit.General", null, "SendAs"),             // key ABSENT → pass
    ("d4", "Audit.Exchange", "Phish", "SendAs"),         // no rules for type → pass
    ("d5", "Audit.AzureActiveDirectory", null, "UserLoginFailed"), // match → pass
    ("d6", "Audit.AzureActiveDirectory", null, "SendAs"),          // != → drop
    ("d7", "DLP.All", null, "FileDeleted")                         // no rules → pass
  ).toDF("doc_id", "content_type", "Policy", "operation")

  val rules = Seq(
    RoutingRule("Audit.General", "Policy", "Spoof"),
    RoutingRule("Audit.AzureActiveDirectory", "operation", "UserLoginFailed"))

  test("static filter: absent-key-passes + conjunctive equality") {
    val got = FilterStage.applyStatic(rows, rules)
      .select("doc_id").as[String].collect().sorted
    assert(got.toSeq === Seq("d1", "d3", "d4", "d5", "d7"))
  }

  test("rule key missing from schema entirely → all rows pass (absent key)") {
    val got = FilterStage.applyStatic(rows,
      Seq(RoutingRule("Audit.General", "NoSuchKey", "x")))
    assert(got.count() === rows.count())
  }

  test("broadcast-join filter is semantically identical to static") {
    val rulesDf = rules.toDF()
    val a = FilterStage.applyStatic(rows, rules)
    val b = FilterStage.applyJoin(rows, rulesDf, Seq("Policy", "operation"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("join filter resolves capitalized rule keys like static does (reference configs)") {
    // reference filter.yaml uses "Operation" against our "operation" column
    val capRules = Seq(
      RoutingRule("Audit.AzureActiveDirectory", "Operation", "UserLoginFailed"))
    val a = FilterStage.applyStatic(rows, capRules)
    val b = FilterStage.applyJoin(rows, capRules.toDF(), Seq("Policy", "operation"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() < rows.count(), "the capitalized rule must actually filter")
  }

  test("join filter broadcasts (no shuffle of the fact side)") {
    val plan = FilterStage.applyJoin(rows, rules.toDF(), Seq("Policy", "operation"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join in plan:\n$plan")
  }

  test("property: adding a rule never increases survivors (monotonicity)") {
    val parsed = Parse.deriveFields(DataGen.sequences(spark, 500L, 2)).cache()
    val allRules = DataGen.routingRules
    val counts = allRules.inits.toSeq.reverse.map(rs =>
      FilterStage.applyStatic(parsed, rs).count())
    assert(counts === counts.sorted.reverse,
      s"survivor counts must be non-increasing as rules are added: $counts")
  }

  test("filter selects a non-empty, non-total subset on fixture data") {
    val parsed = Parse.deriveFields(DataGen.sequences(spark, 2000L, 2))
    val n = parsed.count()
    val k = FilterStage.applyStatic(parsed, DataGen.routingRules).count()
    assert(k > 0 && k < n, s"filter kept $k of $n")
  }
}
