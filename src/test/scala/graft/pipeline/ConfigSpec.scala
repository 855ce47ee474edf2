package graft.pipeline

import graft.SparkSuite

/** Config parsing pinned against the reference's shipped example configs
  * (Release/ConfigExamples — fixtures reproduced inline). */
class ConfigSpec extends SparkSuite {

  val fullConfig =
    """log:  # Log settings. Debug will severely decrease performance
      |  path: 'collector.log'
      |  debug: False
      |collect:  # Settings determining which audit logs to collect
      |  workingDir: ./ # Directory to save cache files in
      |  contentTypes:
      |    Audit.General: True
      |    Audit.AzureActiveDirectory: True
      |    Audit.Exchange: True
      |    Audit.SharePoint: True
      |    DLP.All: True
      |  cacheSize: 500000  # Amount of logs to cache/batch until outputting
      |  maxThreads: 50  # Maximum number of simultaneous threads
      |  globalTimeout: 1  # Number of minutes before forced exit
      |  retries: 3  # Times to retry retrieving a content blob
      |  skipKnownLogs: True  # Remember retrieved log blobs
      |  hoursToCollect: 24  # Look back this many hours
      |  duplicate: 1  # Amount of times to download each log
      |  filter:  # Only logs that match ALL filters are collected
      |    Audit.General:
      |    Audit.AzureActiveDirectory:
      |    Audit.Exchange:
      |    Audit.SharePoint:
      |    DLP.All:
      |output:
      |  file:  # CSV output
      |    enabled: False
      |    separateByContentType: True
      |    path: 'output.csv'
      |    separator: ';'
      |""".stripMargin

  val filterConfig =
    """collect:
      |  contentTypes:
      |    Audit.General: True
      |    Audit.AzureActiveDirectory: True
      |    Audit.SharePoint: True
      |  filter:
      |    Audit.General:
      |      Policy: Spoof
      |    Audit.AzureActiveDirectory:
      |      Operation: UserLoginFailed
      |    Audit.SharePoint:
      |      Operation: FileDeleted
      |""".stripMargin

  test("fullConfig parses with reference defaults") {
    val c = CollectorConfig.fromYaml(fullConfig)
    assert(c.collect.contentTypes === Schemas.ContentTypes)
    assert(c.collect.cacheSize === 500000)
    assert(c.collect.maxThreads === 50)
    assert(c.collect.retries === 3)
    assert(c.collect.skipKnownLogs)
    assert(c.collect.hoursToCollect === 24)
    assert(c.collect.duplicate === 1)
    assert(c.collect.filter === Nil) // empty filter sections = no rules
    val f = c.output.file.get
    assert(!f.enabled && f.separateByContentType && f.separator === ";")
    assert(f.path === "output.csv")
  }

  test("filter.yaml parses to the routing rules, disabled types excluded") {
    val c = CollectorConfig.fromYaml(filterConfig)
    assert(c.collect.contentTypes ===
      Seq("Audit.General", "Audit.AzureActiveDirectory", "Audit.SharePoint"))
    assert(c.collect.filter === Seq(
      RoutingRule("Audit.General", "Policy", "Spoof"),
      RoutingRule("Audit.AzureActiveDirectory", "Operation", "UserLoginFailed"),
      RoutingRule("Audit.SharePoint", "Operation", "FileDeleted")))
  }

  test("config-driven run honours subscriptions, filters and duplicate") {
    // filter.yaml has no output section → with honored enablement no record
    // sinks would be written; run in engine-default sink mode for this test
    val cfg0 = CollectorConfig.toPipelineConfig(CollectorConfig.fromYaml(filterConfig))
      .copy(output = None)
    assert(cfg0.enabledTypes.size === 3)
    val out = tmpDir("cfgrun")
    val seqs = DataGen.sequences(spark, 2000L, 4)
    val res = Pipeline.run(spark, seqs, out, cfg0.copy(duplicate = 2))
    // routed rows only from the three subscribed types
    import org.apache.spark.sql.functions._
    val types = spark.read.parquet(s"$out/graylog")
      .select("content_type").distinct().collect().map(_.getString(0)).toSet
    assert(types.subsetOf(cfg0.enabledTypes.toSet))
    // capitalized rule key 'Operation' resolves to the 'operation' column:
    // AAD rows must all be UserLoginFailed
    val aadOps = spark.read.parquet(s"$out/graylog")
      .filter(col("content_type") === "Audit.AzureActiveDirectory")
      .select("operation").distinct().collect().map(_.getString(0)).toSet
    assert(aadOps === Set("UserLoginFailed"))
    // duplicate=2 doubles routed rows vs a duplicate=1 run
    val out1 = tmpDir("cfgrun1")
    val res1 = Pipeline.run(spark, seqs, out1, cfg0)
    assert(res.stats.rowsRouted === 2 * res1.stats.rowsRouted)
    // but state still carries each id once
    val stateRows = new StateStore(s"$out/state").load(spark, cfg0.nowEpochSec)
    assert(stateRows.select("content_id").distinct().count() === stateRows.count())
  }

  test("output enablement honored: disabled file sink skipped, enabled CSV written") {
    val yaml =
      """collect:
        |  contentTypes:
        |    Audit.General: True
        |    Audit.Exchange: True
        |output:
        |  file:
        |    enabled: True
        |    separateByContentType: True
        |    path: 'out.csv'
        |    separator: ';'
        |  graylog:
        |    address: localhost
        |    port: 5555
        |""".stripMargin
    val cfg = CollectorConfig.toPipelineConfig(CollectorConfig.fromYaml(yaml))
    val out = tmpDir("cfgout")
    Pipeline.run(spark, DataGen.sequences(spark, 500L, 2), out, cfg)
    val files = new java.io.File(out).list().toSet
    // enabled: separated CSV files (timestamped) + graylog; not configured:
    // fluentd / log_analytics; always: prtg, checksums, metrics, state
    assert(files.exists(_.contains("_out_Audit")), s"csv files missing in $files")
    assert(files.contains("graylog"))
    assert(!files.contains("fluentd") && !files.contains("log_analytics"))
    assert(files.contains("prtg") && files.contains("metrics") && files.contains("state"))
    // disabled file sink: flip enabled → False, no CSV appears
    val cfg2 = CollectorConfig.toPipelineConfig(
      CollectorConfig.fromYaml(yaml.replace("enabled: True", "enabled: False")))
    val out2 = tmpDir("cfgout2")
    Pipeline.run(spark, DataGen.sequences(spark, 500L, 2), out2, cfg2)
    val files2 = new java.io.File(out2).list().toSet
    assert(!files2.exists(_.contains("out_Audit")) && !files2.contains("file_csv"))
    assert(files2.contains("graylog"))
  }

  test("malformed yaml fails fast (reference panics on bad config)") {
    intercept[IllegalArgumentException](CollectorConfig.fromYaml("collect\n  oops"))
  }
}
