package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}

/**
 * Loopback-transport tests: the byte-level sink writers against real local
 * sockets — a ServerSocket standing in for Graylog's TCP input and a JDK
 * HttpServer standing in for the OMS data-collector endpoint. Asserts the
 * record counts reconcile AND the bytes/headers are exactly what the
 * reference emits (line-framed JSON; SharedKey-signed POST).
 */
class TransportSpec extends SparkSuite {
  import spark.implicits._

  lazy val routed = Pipeline.routedRecords(
    DataGen.sequences(spark, 1000L, 4), DataGen.routingRules).cache()

  test("Graylog TCP: every routed record arrives once, line-framed, byte-exact") {
    val server = new graft.LineCaptureServer
    try {
      val shaped = Sinks.graylogShape(routed)
      val expCount = shaped.count()
      val sent = Transport.sendGraylogTcp(routed, "127.0.0.1", server.port)
      assert(sent === expCount)
      server.awaitCount(expCount)
      assert(server.received.size === expCount, "every record must arrive exactly once")
      // byte-exact sampled record: the wire line equals the driver-side
      // to_json of the same shaped row
      val someId = shaped.select("doc_id").as[String].head()
      val wanted = shaped.filter(col("doc_id") === someId)
        .select(to_json(struct(shaped.columns.map(col): _*))).as[String].head()
      assert(server.received.contains(wanted), s"wire format drifted; wanted: $wanted")
      // framing: a received line is self-contained JSON with the enrich field
      assert(wanted.contains("\"timestamp\":"))
    } finally server.close()
  }

  test("Fluentd forward: every record arrives once; sampled message byte-exact") {
    val server = new graft.LineCaptureServer
    try {
      val shaped = Sinks.fluentdShape(routed, "MyTenant")
        .filter(col("event_time").isNotNull)
      val expCount = shaped.count()
      // maxBatch=1 → one forward-mode message per record, so a sampled
      // message is reconstructable driver-side byte-for-byte
      val sent = Transport.sendFluentdForward(routed, "127.0.0.1", server.port,
        "MyTenant", maxBatch = 1)
      assert(sent === expCount)
      server.awaitCount(expCount)
      assert(server.received.size === expCount, "every entry must arrive exactly once")
      val sample = shaped
        .select(unix_timestamp(col("event_time")).as("t"),
          to_json(col("record")).as("rec"))
        .as[(Long, String)].head()
      val wanted = s"""["MyTenant",[[${sample._1},${sample._2}]]]"""
      assert(server.received.contains(wanted), s"wire format drifted; wanted: $wanted")
    } finally server.close()
  }

  test("Fluentd forward: flush at the reference's 1,000-entry batch bound") {
    val server = new graft.LineCaptureServer
    try {
      // ~3k routed rows in ONE partition → ceil(n/1000) messages, all full
      // batches except the terminal flush (the poston max_flush_entries
      // bound, fluentd_interface.rs:22-28)
      val onePart = Pipeline.routedRecords(
        DataGen.sequences(spark, 8000L, 1), DataGen.routingRules)
      val expCount = Sinks.fluentdShape(onePart, "T")
        .filter(col("event_time").isNotNull).count()
      val sent = Transport.sendFluentdForward(onePart, "127.0.0.1", server.port, "T")
      assert(sent === expCount)
      val expMsgs = (expCount + 999) / 1000
      server.awaitCount(expMsgs)
      val msgs = server.received.toArray(Array.empty[String])
      assert(msgs.length === expMsgs,
        s"expected $expMsgs forward messages for $expCount entries, got ${msgs.length}")
      // entry counts per message: all full batches except possibly the last
      val sizes = msgs.map(m => "\"doc_id\"".r.findAllIn(m).size).sorted.reverse
      assert(sizes.sum === expCount)
      assert(sizes.init.forall(_ === 1000),
        s"non-terminal flushes must carry exactly maxBatch entries: ${sizes.toSeq}")
      // every message is a well-formed ["tag",[...]] frame
      assert(msgs.forall(m => m.startsWith("[\"T\",[[") && m.endsWith("]]")))
    } finally server.close()
  }

  test("OMS POST: SharedKey signature verifies server-side; bodies reconcile") {
    val workspaceId = "ws-test-1234"
    val keyB64 = java.util.Base64.getEncoder.encodeToString(
      "a-test-shared-key-32-bytes-long!".getBytes("UTF-8"))
    case class Post(auth: String, date: String, logType: String,
                    tgf: String, len: Long, body: String)
    val posts = new ConcurrentLinkedQueue[Post]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/logs", new com.sun.net.httpserver.HttpHandler {
      def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        posts.add(Post(
          ex.getRequestHeaders.getFirst("Authorization"),
          ex.getRequestHeaders.getFirst("x-ms-date"),
          ex.getRequestHeaders.getFirst("Log-Type"),
          ex.getRequestHeaders.getFirst("time-generated-field"),
          body.getBytes("UTF-8").length.toLong, body))
        val resp = "OK".getBytes("UTF-8")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.setExecutor(Executors.newFixedThreadPool(8))
    server.start()
    try {
      val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/api/logs"
      val expected = Sinks.logAnalyticsShape(routed).cache()
      val sent = Transport.sendOms(routed, endpoint, workspaceId, keyB64,
        maxBatch = 50)
      assert(sent === expected.count())
      val got = posts.toArray(Array.empty[Post])
      assert(got.nonEmpty)
      got.foreach { p =>
        // recompute the signature from the request's own date + length —
        // what a real OMS endpoint does to authenticate the caller
        val want = OmsSignature.buildSignature(workspaceId, keyB64, p.date, p.len)
        assert(p.auth === want, s"signature mismatch for ${p.logType}")
        assert(p.tgf === "CreationTime")
        assert(p.logType.nonEmpty && !p.logType.contains("."))
      }
      // bodies: JSON arrays that parse back to exactly the shaped rows
      val bodies = got.map(_.body).toSeq.toDS()
      val back = spark.read.json(bodies)
      assert(back.count() === expected.count())
      // per-type counts survive the batching
      val wantTypes = expected.groupBy("log_type").count()
        .as[(String, Long)].collect().toMap
      val gotTypes = got.groupBy(_.logType).view.mapValues(ps =>
        spark.read.json(ps.map(_.body).toSeq.toDS()).count()).toMap
      assert(gotTypes === wantTypes)
    } finally server.stop(0)
  }

  test("OMS POST: a non-2xx endpoint fails the job (bounded task retry, not silent loss)") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/logs", new com.sun.net.httpserver.HttpHandler {
      def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
        ex.sendResponseHeaders(503, -1); ex.close()
      }
    })
    server.start()
    try {
      val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/api/logs"
      val e = intercept[org.apache.spark.SparkException] {
        Transport.sendOms(routed, endpoint, "ws", java.util.Base64.getEncoder
          .encodeToString("k".getBytes), maxBatch = 50)
      }
      assert(e.getMessage.contains("503") ||
        Option(e.getCause).exists(_.getMessage.contains("503")))
    } finally server.stop(0)
  }

  test("Graylog TCP: an unreachable endpoint fails the job loudly") {
    val dead = new java.net.ServerSocket(0)
    val port = dead.getLocalPort
    dead.close() // nothing listens here anymore
    intercept[org.apache.spark.SparkException] {
      Transport.sendGraylogTcp(routed, "127.0.0.1", port)
    }
  }
}
