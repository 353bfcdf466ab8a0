package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{lit, to_timestamp}
import graft.SparkSpecBase

/** §3.1 end-to-end: base64 Pub/Sub envelopes and raw RFC-822 messages in,
  * login outcomes out — every reference stage crossed in one run. */
class IngestPipelineSpec extends SparkSpecBase {

  private def b64(s: String) =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private def rawEmail(to: String, otp: Option[String], date: String) = {
    val body = otp.map(o => s"<p>Your otp code is $o</p>")
      .getOrElse("<p>hello, nothing here</p>")
    s"""From: Zepto <no-reply@zepto.co.in>
       |To: Buyer <$to>
       |Date: $date
       |Content-Type: text/html; charset=utf-8
       |
       |<html><body>$body</body></html>""".stripMargin
  }

  test("notifications: envelope decode + null-guard + monotone watermark") {
    implicit val s = spark
    import s.implicits._
    val input = MemoryStream[String](spark)
    val envelopes = input.toDS().toDF("data_b64")
    val q = IngestPipeline.notifications(envelopes)
      .writeStream.format("memory").queryName("notif_out")
      .outputMode("append").start()
    try {
      input.addData(
        b64("""{"historyId": 100, "emailAddress": "inbox@example.com"}"""),
        b64("""{"historyId": 90, "emailAddress": "inbox@example.com"}"""),  // stale
        b64("""{"emailAddress": "inbox@example.com"}"""),                   // F1: no id
        b64("""{"historyId": 200, "emailAddress": "other@example.com"}"""))
      q.processAllAvailable()
      input.addData(
        b64("""{"historyId": 100, "emailAddress": "inbox@example.com"}"""), // dup
        b64("""{"historyId": 150, "emailAddress": "inbox@example.com"}"""))
      q.processAllAvailable()
      val rows = spark.table("notif_out")
        .as[StreamOps.MailboxWatermark].collect().toSet
      // within a batch the guard orders ascending, so 90 and 100 both
      // advance in batch 1; ACROSS batches staleness is enforced (the
      // batch-2 duplicate 100 is dropped, 150 advances)
      assert(rows == Set(
        StreamOps.MailboxWatermark("inbox@example.com", 90),
        StreamOps.MailboxWatermark("inbox@example.com", 100),
        StreamOps.MailboxWatermark("other@example.com", 200),
        StreamOps.MailboxWatermark("inbox@example.com", 150)))
    } finally q.stop()
  }

  test("notificationsWithRejects: every failure lands in the dead-letter with its cause") {
    implicit val s = spark
    import s.implicits._
    val input = MemoryStream[String](spark)
    val (accepted, rejects) = IngestPipeline
      .notificationsWithRejects(input.toDS().toDF("data_b64"))
    val qa = accepted.writeStream.format("memory").queryName("dl_ok")
      .outputMode("append").start()
    val qr = rejects.writeStream.format("memory").queryName("dl_bad")
      .outputMode("append").start()
    try {
      input.addData(
        b64("""{"historyId": 10, "emailAddress": "a@x.com"}"""), // ok
        "%%%not-base64%%%",                                      // bad-base64
        b64("""this is not json at all"""),                      // bad-json
        b64("""{"emailAddress": "a@x.com"}"""),                  // missing id
        b64("""{"historyId": 5, "emailAddress": "a@x.com"}"""))  // stale → guard drop
      qa.processAllAvailable(); qr.processAllAvailable()
      val ok = spark.table("dl_ok").as[StreamOps.MailboxWatermark].collect().toSet
      val bad = spark.table("dl_bad").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      // within one batch the guard processes ids ascending (5 then 10),
      // so both advance; cross-batch staleness is covered by the first test
      assert(ok.map(_.historyId) == Set(5L, 10L),
        s"accepted advances wrong: $ok")
      assert(bad == Set(
        ("%%%not-base64%%%", "bad-base64"),
        (b64("""this is not json at all"""), "bad-json"),
        (b64("""{"emailAddress": "a@x.com"}"""), "missing-historyId")),
        s"dead-letter wrong: $bad")
      // conservation: nothing silently vanished at the decode tier
      assert(ok.size + bad.size == 5)
    } finally { qa.stop(); qr.stop() }
  }

  test("full run: raw MIME + requests → outcomes (fresh otp wins, stale/no-otp dropped)") {
    implicit val s = spark
    import s.implicits._
    val msgIn = MemoryStream[String](spark)
    val reqIn = MemoryStream[LoginRequest](spark)
    val messages = msgIn.toDS().toDF("raw_email")
    // pin "now" so the 2-minute freshness window is deterministic
    val now = to_timestamp(lit("2024-01-02 10:31:00"))
    val q = IngestPipeline.run(messages, reqIn.toDS(), now)
      .writeStream.format("memory").queryName("pipe_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
      .start()
    try {
      reqIn.addData(
        LoginRequest("zepto_frank", "zepto", "frank", new Timestamp(1704191400000L)),
        LoginRequest("zepto_grace", "zepto", "grace", new Timestamp(1704191400000L)))
      msgIn.addData(
        // fresh (10:30 vs now 10:31), has OTP → resolves frank
        rawEmail("frank@example.com", Some("4321"), "Tue, 2 Jan 2024 10:30:00 +0000"),
        // STALE (>2 min old) → dropped by F4 even though it has an OTP
        rawEmail("grace@example.com", Some("9999"), "Tue, 2 Jan 2024 10:00:00 +0000"),
        // fresh but no OTP → dropped by F5
        rawEmail("grace@example.com", None, "Tue, 2 Jan 2024 10:30:30 +0000"))
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("pipe_out").count() < 1 &&
             System.currentTimeMillis() < deadline) Thread.sleep(200)
      val rows = spark.table("pipe_out").as[LoginOutcome].collect()
      assert(rows.toSet == Set(LoginOutcome("zepto_frank",
        SessionStatus.Success, Some("4321"), "otp received")))
    } finally q.stop()
  }
}
