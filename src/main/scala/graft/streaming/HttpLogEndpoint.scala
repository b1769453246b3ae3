package graft.streaming

import java.net.{InetAddress, InetSocketAddress}
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** S4 — the reference's HTTP log ingestion endpoint, made real.
  *
  * The reference ships a Spring Boot REST stub
  * (gmall-logger/src/main/java/com/atguigu/gmalllogger/controller/LoggerController.java:8-12
  * — only a `test` ping is implemented; the production shape it stands
  * for receives client applog POSTs and forwards them to Kafka). The
  * Spark-native analogue: a JDK `com.sun.net.httpserver.HttpServer`
  * (public java.net API, LOOPBACK-bound — this is an in-process test
  * double, not a hardened web server) that appends each POST body's
  * lines to a [[FileTopic]] segment — endpoint → transport →
  * `readStream`, the same three-hop shape the reference runs.
  *
  * Deliberately NOT a Spark source: Structured Streaming consumes the
  * TOPIC (`FileTopic.stream` here, `format("kafka")` in production),
  * exactly as the reference's Flink jobs consume the topic the
  * endpoint fed. That puts durability, backpressure and replay in the
  * transport where they belong — an endpoint that buffered rows in
  * memory for a receiver would lose them on crash; one that writes
  * straight to the log hands every accepted request to the
  * at-least-once replay machinery (a retried POST after a lost 200 is
  * a duplicate segment, absorbed by the idempotent sinks like any
  * producer resend).
  *
  * Endpoints:
  *  - `POST /applog` — body = newline-separated log lines, appended as
  *    one segment; responds 200 after the segment is durably renamed
  *    in (ack-after-write, so a 200 really means "in the log").
  *  - `GET /ping` — liveness, the reference's `test` controller.
  */
object HttpLogEndpoint {

  /** Start on 127.0.0.1:`port` (0 = ephemeral; read the bound port off
    * the returned server). Single-threaded executor: segment appends
    * serialize, so concurrent POSTs can't interleave a segment. */
  def start(topicDir: String, port: Int = 0): HttpServer = {
    val srv = HttpServer.create(
      new InetSocketAddress(InetAddress.getLoopbackAddress, port), 0)
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
    srv.createContext("/applog", (ex: HttpExchange) =>
      try {
        if (ex.getRequestMethod == "POST") {
          val body = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
          val lines = body.split("\n").iterator.filter(_.nonEmpty).toSeq
          if (lines.nonEmpty) FileTopic.produce(topicDir, lines)
          respond(ex, 200, s"""{"accepted":${lines.size}}""")
        } else respond(ex, 405, "POST only")
      } finally ex.close())
    srv.createContext("/ping", (ex: HttpExchange) =>
      try respond(ex, 200, "pong") finally ex.close())
    srv.setExecutor(null)
    srv.start()
    srv
  }
}
