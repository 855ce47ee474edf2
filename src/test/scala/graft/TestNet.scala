package graft

import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}

/** Shared loopback line-capture server for transport tests: accepts any
  * number of concurrent connections, drains newline-framed UTF-8 records
  * into `received`. One implementation for every suite that needs it. */
final class LineCaptureServer {
  val received = new ConcurrentLinkedQueue[String]()
  private val server = new java.net.ServerSocket(0)
  private val pool = Executors.newCachedThreadPool()
  @volatile private var stopped = false

  def port: Int = server.getLocalPort

  pool.submit(new Runnable {
    def run(): Unit = while (!stopped) {
      try {
        val sock = server.accept()
        pool.submit(new Runnable {
          def run(): Unit = {
            val in = new java.io.BufferedReader(new java.io.InputStreamReader(
              sock.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
            var line = in.readLine()
            while (line != null) { received.add(line); line = in.readLine() }
            sock.close()
          }
        })
      } catch { case _: java.net.SocketException => () /* closed */ }
    }
  })

  /** Reader threads may still be draining after the sending job returns. */
  def awaitCount(n: Long, timeoutSec: Int = 30): Unit = {
    val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(timeoutSec)
    while (received.size < n && System.nanoTime() < deadline) Thread.sleep(20)
  }

  def close(): Unit = { stopped = true; server.close(); pool.shutdownNow(); () }
}
