package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpecBase

/** The transformWithState (arbitrary-state API v2) form of the OTP
  * correlator, run end-to-end under the RocksDB state store provider —
  * the same FIXTURES.md §B5 sequences as OtpCorrelationSpec's streaming
  * tests, so both implementations are pinned to identical semantics. */
class OtpCorrelationTwsSpec extends SparkSpecBase {

  private def ts(s: Long) = new Timestamp(1704100000000L + s * 1000)
  private def req(key: String, at: Long) = CorrelationEvent(
    key, ts(at), Some(LoginRequest(key, "zepto", key.stripPrefix("zepto_"), ts(at))), None)
  private def otp(key: String, code: String, at: Long) =
    CorrelationEvent(key, ts(at), None, Some(code))

  /** transformWithState requires RocksDB; scope the provider override to
    * each test so the suite's other (HDFS-state) streaming tests are
    * unaffected. */
  private def withRocksDb[A](f: SparkSession => A): A = {
    val k = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f(spark)
    finally prev match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }

  private def awaitRows(table: String, n: Long, ms: Long = 60000): Unit = {
    val deadline = System.currentTimeMillis() + ms
    while (spark.table(table).count() < n &&
           System.currentTimeMillis() < deadline) Thread.sleep(200)
  }

  test("tws: happy path + no-session drop + F5, under RocksDB state store") {
    withRocksDb { implicit s =>
      import s.implicits._
      val input = MemoryStream[CorrelationEvent](s)
      val q = OtpCorrelationTws.correlate(input.toDS())
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("500 milliseconds"))
        .start()
      try {
        input.addData(req("zepto_alice", 0), req("zepto_bob", 0))
        input.addData(otp("zepto_alice", "7777", 30), otp("zepto_nobody", "0000", 31))
        awaitRows("tws_out", 1)
        // Drain at least one more trigger before asserting the negative
        // cases (no outcome for bob, dropped OTP for nobody): a sentinel
        // pair added AFTER the awaited row must complete first, so any
        // wrongly-emitted extra row for bob/nobody would land before it.
        input.addData(req("zepto_sentinel", 60))
        input.addData(otp("zepto_sentinel", "9999", 61))
        awaitRows("tws_out", 2)
        val rows = s.table("tws_out").as[LoginOutcome].collect()
        assert(rows.toSet == Set(
          LoginOutcome("zepto_alice", SessionStatus.Success, Some("7777"), "otp received"),
          LoginOutcome("zepto_sentinel", SessionStatus.Success, Some("9999"), "otp received")))
      } finally q.stop()
    }
  }

  test("tws: terminal re-entry returns the cached outcome") {
    withRocksDb { implicit s =>
      import s.implicits._
      val input = MemoryStream[CorrelationEvent](s)
      val q = OtpCorrelationTws.correlate(input.toDS())
        .writeStream.format("memory").queryName("tws_cache_out")
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("500 milliseconds"))
        .start()
      try {
        input.addData(req("zepto_carol", 0))
        input.addData(otp("zepto_carol", "4242", 1))
        awaitRows("tws_cache_out", 1)
        input.addData(req("zepto_carol", 60)) // re-entry after success
        awaitRows("tws_cache_out", 2)
        val rows = s.table("tws_cache_out").as[LoginOutcome].collect().toSet
        assert(rows == Set(
          LoginOutcome("zepto_carol", SessionStatus.Success, Some("4242"), "otp received"),
          LoginOutcome("zepto_carol", SessionStatus.Success, Some("4242"), "cached")))
      } finally q.stop()
    }
  }

  test("tws: non-zepto platform rejected, no state created (F7)") {
    withRocksDb { implicit s =>
      import s.implicits._
      val input = MemoryStream[CorrelationEvent](s)
      val q = OtpCorrelationTws.correlate(input.toDS())
        .writeStream.format("memory").queryName("tws_f7_out")
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("500 milliseconds"))
        .start()
      try {
        input.addData(CorrelationEvent("swiggy_u9", ts(0),
          Some(LoginRequest("swiggy_u9", "swiggy", "u9", ts(0))), None))
        // an OTP for the rejected key must be dropped (no session opened)
        input.addData(otp("swiggy_u9", "1234", 5))
        awaitRows("tws_f7_out", 1)
        val rows = s.table("tws_f7_out").as[LoginOutcome].collect()
        assert(rows.length == 1)
        assert(rows.head.status == SessionStatus.Error)
        assert(rows.head.message.contains("unsupported platform"))
      } finally q.stop()
    }
  }

  test("tws: monotone guard also runs under RocksDB (provider is a config, not a code change)") {
    withRocksDb { implicit s =>
      import s.implicits._
      val input = MemoryStream[StreamOps.HistoryEvent](s)
      val q = StreamOps.monotoneWatermarkGuard(input.toDS())
        .writeStream.format("memory").queryName("tws_guard_out")
        .outputMode("append").start()
      try {
        input.addData(StreamOps.HistoryEvent("m1", 10))
        q.processAllAvailable()
        // 7 arrives AFTER 10 was committed to the state store → stale
        input.addData(
          StreamOps.HistoryEvent("m1", 7),
          StreamOps.HistoryEvent("m1", 12))
        q.processAllAvailable()
        input.addData(StreamOps.HistoryEvent("m1", 11)) // stale vs stored 12
        q.processAllAvailable()
        val out = s.table("tws_guard_out").as[StreamOps.MailboxWatermark]
          .collect().map(_.historyId).sorted
        assert(out.toSeq == Seq(10L, 12L))
      } finally q.stop()
    }
  }
}
