package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Byte-level sink transports (SURVEY.md §2.1 S6/S8): the reference actually
 * emits over the network — Graylog line-framed JSON over TCP
 * (src/interfaces/graylog_interface.rs:35-78) and Azure Log Analytics (OMS)
 * HMAC-signed HTTP POSTs (src/interfaces/azure_oms_interface.rs:56-129).
 * The parquet sink *shapes* in [[Sinks]] remain the table-to-table
 * contract; these writers exercise the same rows over real sockets.
 *
 * Distribution shape: one connection per PARTITION, records streamed
 * through it — the reference opens a socket per record (:35-40), which at
 * 100 TB is a SYN flood; per-partition connections keep the same record
 * framing while the fan-out parallelism comes from partitioning, exactly
 * how a Spark `foreachPartition` sink is supposed to amortize connection
 * setup. Both writers return the records actually sent so callers can
 * reconcile against routed counts (SURVEY §2.4 A2).
 */
object Transport {

  /**
   * Graylog TCP writer: each record is the [[Sinks.graylogShape]] row
   * (timestamp-enriched, unparsable rows dropped) serialized to one JSON
   * object, framed by a single '\n' (the reference sends one JSON message
   * per socket write). Returns the number of records sent.
   */
  def sendGraylogTcp(df: DataFrame, host: String, port: Int): Long = {
    val shaped = Sinks.graylogShape(df)
    val lines = shaped.select(to_json(struct(shaped.columns.map(col): _*)).as("line"))
    import shaped.sparkSession.implicits._
    lines.as[String].mapPartitions { it =>
      if (!it.hasNext) Iterator(0L)
      else {
        val sock = new java.net.Socket(host, port)
        try {
          val out = new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16)
          var n = 0L
          it.foreach { s =>
            out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            out.write('\n')
            n += 1
          }
          out.flush()
          Iterator(n)
        } finally sock.close()
      }
      // rdd.fold, not Dataset.reduce: reduce throws on a ZERO-partition
      // input (e.g. limit(0) collapsed to an empty LocalRelation) where
      // the contract is "0 records sent"
    }.rdd.fold(0L)(_ + _)
  }

  /**
   * OMS (Azure Log Analytics) signed-POST writer: rows are
   * [[Sinks.logAnalyticsShape]]d to (log_type, body-json), batched per
   * (partition, log_type) into JSON-array bodies of at most `maxBatch`
   * records, and POSTed with the reference's exact header set —
   * `Authorization: SharedKey …` ([[OmsSignature]], RFC-4231-pinned),
   * `Log-Type`, `x-ms-date` (RFC 1123), `time-generated-field` and
   * `Content-Type: application/json`. The reference caps in-flight
   * requests at 10 (:56-60); here each partition posts sequentially and
   * the in-flight cap is the partition count — same backpressure lever,
   * expressed as partitioning. Returns the number of records posted;
   * a non-2xx response fails the task (Spark's bounded task retry is the
   * transport-retry half of ST6).
   */
  def sendOms(df: DataFrame, endpoint: String, workspaceId: String,
              sharedKeyB64: String, maxBatch: Int = 1000): Long = {
    require(maxBatch > 0)
    val shaped = Sinks.logAnalyticsShape(df)
    import shaped.sparkSession.implicits._
    shaped.select(col("log_type"), col("body")).as[(String, String)]
      .mapPartitions { it =>
        // batch per log_type within the partition (the reference posts one
        // content type per request)
        val buf = scala.collection.mutable.Map[String, scala.collection.mutable.ArrayBuffer[String]]()
        var sent = 0L
        def flush(logType: String): Unit = {
          val rows = buf(logType)
          if (rows.nonEmpty) {
            postOms(endpoint, workspaceId, sharedKeyB64, logType,
              rows.mkString("[", ",", "]"))
            sent += rows.size
            rows.clear()
          }
        }
        it.foreach { case (lt, body) =>
          val rows = buf.getOrElseUpdate(lt, scala.collection.mutable.ArrayBuffer[String]())
          rows += body
          if (rows.size >= maxBatch) flush(lt)
        }
        buf.keys.foreach(flush)
        Iterator(sent)
      }.rdd.fold(0L)(_ + _)
  }

  /**
   * Fluentd forward-protocol writer (JSON mode): the reference forwards
   * each record through a poston worker pool with 1,000-entry / 10 ms flush
   * batching (src/interfaces/fluentd_interface.rs:15-55, settings at
   * :22-28) — tag = the configured tenant name, event time parsed from the
   * record's CreationTime (:58-64). Here each PARTITION holds one
   * connection and emits Forward-mode messages
   *
   *   ["<tenant>", [[<epoch_sec>, {record}], ...]]\n
   *
   * flushed every `maxBatch` entries — the reference's batch bound; its
   * 10 ms timer flush is an async-worker liveness detail with no analog in
   * a run-to-completion task, where the end-of-partition flush plays that
   * role. Records whose CreationTime is missing/unparsable are dropped
   * (the reference PANICS on them, :60 unwrap — a poison row; our
   * quarantine path is where they surface). Returns entries sent.
   */
  def sendFluentdForward(df: DataFrame, host: String, port: Int,
                         tenant: String = "MyTenant",
                         maxBatch: Int = 1000): Long = {
    require(maxBatch > 0)
    val shaped = Sinks.fluentdShape(df, tenant)
    val wire = shaped.filter(col("event_time").isNotNull)
      .select(unix_timestamp(col("event_time")).as("t"),
        to_json(col("record")).as("rec"))
    val header = "[" + jsonString(tenant) + ",["
    import shaped.sparkSession.implicits._
    wire.as[(Long, String)].mapPartitions { it =>
      if (!it.hasNext) Iterator(0L)
      else {
        val sock = new java.net.Socket(host, port)
        try {
          val out = new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16)
          val buf = new scala.collection.mutable.ArrayBuffer[String](maxBatch)
          var n = 0L
          def flush(): Unit = if (buf.nonEmpty) {
            out.write(header.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            out.write(buf.mkString(",").getBytes(java.nio.charset.StandardCharsets.UTF_8))
            out.write("]]\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
            n += buf.size
            buf.clear()
          }
          it.foreach { case (t, rec) =>
            buf += s"[$t,$rec]"
            if (buf.size >= maxBatch) flush()
          }
          flush()
          out.flush()
          Iterator(n)
        } finally sock.close()
      }
    }.rdd.fold(0L)(_ + _)
  }

  /** Minimal JSON string encoder for the forward-mode tag (config-supplied
    * tenant names can carry quotes/backslashes; records go through
    * to_json, which escapes for itself). */
  private def jsonString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append('"').toString
  }

  /** One signed POST (executor-side). Exposed for the header-level spec. */
  def postOms(endpoint: String, workspaceId: String, sharedKeyB64: String,
              logType: String, bodyJsonArray: String): Int = {
    val bytes = bodyJsonArray.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val date = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
      .format(java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC))
    val auth = OmsSignature.buildSignature(workspaceId, sharedKeyB64, date,
      bytes.length.toLong)
    val conn = java.net.URI.create(endpoint).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      conn.setRequestProperty("Authorization", auth)
      conn.setRequestProperty("Log-Type", logType)
      conn.setRequestProperty("x-ms-date", date)
      conn.setRequestProperty("time-generated-field", "CreationTime")
      conn.getOutputStream.write(bytes)
      conn.getOutputStream.close()
      val code = conn.getResponseCode
      require(code >= 200 && code < 300, s"OMS POST failed: HTTP $code")
      code
    } finally conn.disconnect()
  }
}
