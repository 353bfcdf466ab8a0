package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.SparkSpecBase
import graft.streaming.StreamOps.HistoryEvent

/** The reference's FULL transport loop over real HTTP, end to end:
  * Pub/Sub-style pushes arrive at the webhook receiver (S1), flow
  * through the stateful monotone watermark guard (F2/ST1 — the
  * reference's `last_history_id` dedupe), and the admitted signals
  * leave through the exactly-once HTTP signal sink (S7,
  * `POST {base}/{key}/receive_otp`) — one streaming query, real sockets
  * at both edges, a STATEFUL operator in the middle (which is exactly
  * the configuration where the sink's replay-skip must still process
  * partitions, or state-commit validation kills the restarted query).
  *
  * The kill-restart leg proves exactly-once across the whole loop:
  * pushes delivered twice by the bus produce ONE signal; a restart
  * neither re-POSTs committed batches nor loses the guard state. */
class HttpLoopSpec extends SparkSpecBase {

  private def post(endpoint: String, body: String): Int = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(endpoint))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      .statusCode()
  }

  test("webhook push → stateful guard → signal POST: exactly once across restart") {
    implicit val s = spark
    import s.implicits._
    val spool = java.nio.file.Files.createTempDirectory("loop_spool").toString
    val ckpt = java.nio.file.Files.createTempDirectory("loop_ckpt").toString
    val ledger = java.nio.file.Files.createTempDirectory("loop_ledger").toString
    val rcv = new HttpPushReceiver(spool)

    // the signal-receiving end: records (path, idempotency-key, body)
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()
    val sigSrv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    sigSrv.createContext("/", { ex =>
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        hits.add((ex.getRequestURI.getPath,
          ex.getRequestHeaders.getFirst("Idempotency-Key"), body))
        val ok = "{}".getBytes("UTF-8")
        ex.sendResponseHeaders(200, ok.length)
        ex.getResponseBody.write(ok)
      } finally ex.close()
    })
    sigSrv.start()
    val sigBase = s"http://127.0.0.1:${sigSrv.getAddress.getPort}"

    try {
      val schema = new StructType()
        .add("mailbox", StringType).add("historyId", LongType)
      // one query, two real HTTP edges: spool stream → guard (fMGWS) →
      // signal rows (key = mailbox, otp = the admitted watermark — the
      // loop under test is the transport, not the MIME extraction, which
      // q25/q44 pin separately)
      def run() = HttpSignalSink.start(
        StreamOps.monotoneWatermarkGuard(
          HttpPushReceiver.stream(spark, spool, schema).as[HistoryEvent])
          .toDF()
          .select(col("mailbox").as("key"),
            col("historyId").cast("string").as("otp")),
        sigBase, ledger, ckpt)

      // leg 1: two mailboxes, plus a bus redelivery of a@x's push —
      // exactly one signal per admitted watermark must reach the wire
      // (the server DECODES request paths, so a@x appears literally)
      assert(post(rcv.endpoint, """{"mailbox":"a@x","historyId":5}""") == 200)
      assert(post(rcv.endpoint, """{"mailbox":"b@y","historyId":8}""") == 200)
      assert(post(rcv.endpoint, """{"mailbox":"a@x","historyId":5}""") == 200) // redelivery
      // a key with a SPACE: path-segment encoding must produce %20, not
      // the form-encoded '+' (which a URI path would NOT decode back —
      // the signal would silently route to the wrong resource)
      assert(post(rcv.endpoint, """{"mailbox":"c d@z","historyId":2}""") == 200)
      val q1 = run()
      q1.processAllAvailable()
      q1.stop()
      import scala.jdk.CollectionConverters._
      val leg1 = hits.asScala.toSeq
      assert(leg1.map(h => (h._1, h._3)).sorted == Seq(
        ("/a@x/receive_otp", """{"otp":"5"}"""),
        ("/b@y/receive_otp", """{"otp":"8"}"""),
        ("/c d@z/receive_otp", """{"otp":"2"}""")).sorted,
        s"leg 1 signals wrong: $leg1")
      hits.clear()

      // leg 2: restart from the same checkpoint — committed batches must
      // replay with ZERO wire traffic (the ledger) even though a
      // STATEFUL operator sits upstream; only the new advancing push
      // signals, and the guard state survives across the restart
      // (7 > 5 admits; 3 < 5 is stale AGAINST THE RESTORED STATE — the
      // cross-batch staleness the guard exists for)
      assert(post(rcv.endpoint, """{"mailbox":"a@x","historyId":7}""") == 200)
      assert(post(rcv.endpoint, """{"mailbox":"a@x","historyId":3}""") == 200)
      val q2 = run()
      q2.processAllAvailable()
      q2.stop()
      val leg2 = hits.asScala.toSeq
      assert(leg2.map(h => (h._1, h._3)) == Seq(
        ("/a@x/receive_otp", """{"otp":"7"}""")),
        s"leg 2 signals wrong: $leg2")
      // idempotency tokens are batch-stable and distinct per key
      assert(leg2.forall(_._2.startsWith("graft-")))
    } finally {
      rcv.stop()
      sigSrv.stop(0)
    }
  }
}
