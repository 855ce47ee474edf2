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
