package graft.streaming

import java.sql.Timestamp

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState, Trigger}

import graft.SparkSpecBase
import graft.streaming.HeartbeatMonitor.{Heartbeat, HbState, SilenceAlert}

class HeartbeatMonitorSpec extends SparkSpecBase {

  private def ts(s: Long) = new Timestamp(1704100000000L + s * 1000)
  private val silenceMs = 30000L
  private val step = HeartbeatMonitor.transition(silenceMs) _

  private def state(s: Option[HbState], timedOut: Boolean) =
    TestGroupState.create[HbState](
      optionalState = s.map(Optional.of[HbState]).getOrElse(Optional.empty[HbState]()),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = timedOut)

  test("heartbeat arrival stores newest ts, arms the timer, emits nothing") {
    val st = state(None, timedOut = false)
    val out = step("k", Iterator(Heartbeat("k", ts(5)), Heartbeat("k", ts(9))), st)
    assert(out.isEmpty)
    assert(st.get == HbState(ts(9), 0L))
    assert(st.getTimeoutTimestampMs.isPresent)
  }

  test("silent interval fires an alert and escalates on repeated silence") {
    val st1 = state(Some(HbState(ts(9), 0L)), timedOut = true)
    val a1 = step("k", Iterator.empty, st1).toSeq
    assert(a1 == Seq(SilenceAlert("k", ts(9), 1L)))
    assert(st1.get.nMissed == 1L)
    assert(st1.getTimeoutTimestampMs.isPresent, "monitoring must continue")
    val st2 = state(Some(st1.get), timedOut = true)
    val a2 = step("k", Iterator.empty, st2).toSeq
    assert(a2 == Seq(SilenceAlert("k", ts(9), 2L)))
  }

  test("escalation cap: terminal alert retires the key and clears state") {
    val st = state(Some(HbState(ts(9), 2L)), timedOut = true)
    val out = HeartbeatMonitor.transition(silenceMs, maxEscalations = 3L)(
      "k", Iterator.empty, st).toSeq
    assert(out == Seq(SilenceAlert("k", ts(9), 3L, terminal = true)))
    assert(!st.exists, "state must be removed at the cap")
    assert(!st.getTimeoutTimestampMs.isPresent, "timer must not re-arm")
  }

  test("a new heartbeat resets the escalation count") {
    val st = state(Some(HbState(ts(9), 3L)), timedOut = false)
    assert(step("k", Iterator(Heartbeat("k", ts(60))), st).isEmpty)
    assert(st.get == HbState(ts(60), 0L))
  }

  test("out-of-order heartbeat never regresses last_seen") {
    val st = state(Some(HbState(ts(50), 0L)), timedOut = false)
    assert(step("k", Iterator(Heartbeat("k", ts(10))), st).isEmpty)
    assert(st.get.lastSeen == ts(50))
  }

  test("live stream: a silent key alerts; an active key stays quiet") {
    implicit val s = spark
    import s.implicits._
    val input = MemoryStream[Heartbeat](spark)
    val q = HeartbeatMonitor.monitor(input.toDS(), silenceMs = 2000L)
      .writeStream.format("memory").queryName("hb_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    try {
      input.addData(Heartbeat("quiet", ts(0)), Heartbeat("chatty", ts(0)))
      val deadline = System.currentTimeMillis() + 60000
      var done = false
      while (!done && System.currentTimeMillis() < deadline) {
        // keep "chatty" alive while "quiet" goes silent
        input.addData(Heartbeat("chatty", ts(1)))
        done = spark.table("hb_out").count() >= 1
        Thread.sleep(300)
      }
      val alerts = spark.table("hb_out").as[SilenceAlert].collect()
      // "quiet" must alert with its true last-seen; "chatty" is not
      // asserted silent because a loaded test JVM can stall the feeder
      // loop past the silence window (that alert would be CORRECT)
      val quiet = alerts.filter(_.key == "quiet")
      assert(quiet.nonEmpty, "silent key must alert within the deadline")
      assert(quiet.forall(_.last_seen == ts(0)))
      assert(quiet.map(_.n_missed).min == 1L)
    } finally q.stop()
  }

  test("escalation counter survives checkpoint restart; cap retires the key") {
    implicit val s = spark
    import s.implicits._
    import scala.jdk.CollectionConverters._
    val ckpt = java.nio.file.Files.createTempDirectory("hb_ckpt").toString
    val input = MemoryStream[Heartbeat](spark)
    val cap = 6L
    // batchId-keyed sink: a replayed batch OVERWRITES its slot, so the
    // collected alerts are exactly-once even if stop() cuts a batch
    // between output and commit (the foreachBatch idempotence contract;
    // the memory sink cannot recover from a checkpoint, foreachBatch can)
    val sink = new java.util.concurrent.ConcurrentHashMap[Long, Array[SilenceAlert]]()
    def alerts = sink.values.asScala.flatten.toArray
    def start() =
      HeartbeatMonitor.monitor(input.toDS(), silenceMs = 500L,
          maxEscalations = cap)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("250 milliseconds"))
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[SilenceAlert], id: Long) =>
          sink.put(id, ds.collect()); ()
        }
        .start()
    // phase 1: let the key go silent and escalate at least twice, then
    // kill the query MID-escalation (well before the cap)
    val q1 = start()
    try {
      input.addData(Heartbeat("k", ts(0)))
      val deadline = System.currentTimeMillis() + 60000
      while (alerts.length < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q1.stop()
    val a1 = alerts
    assert(a1.nonEmpty, "escalation must begin before the restart")
    val maxBefore = a1.map(_.n_missed).max
    assert(maxBefore < cap, "restart must land mid-escalation")
    // phase 2: recover from the checkpoint — the escalation counter must
    // RESUME (no reset to 1, no duplicate level), reach the cap exactly
    // once, and then go silent because the key's state was removed
    val q2 = start()
    try {
      def kAlerts = alerts.filter(_.key == "k")
      // a cleanly-stopped checkpoint has no uncommitted batch to replay,
      // and the engine schedules no timeout-only batches until at least
      // one batch has run after recovery — feed a throwaway key to kick
      // it; generous deadline for full-suite load
      val deadline = System.currentTimeMillis() + 120000
      while (!kAlerts.exists(_.terminal) &&
        System.currentTimeMillis() < deadline) {
        input.addData(Heartbeat("nudge", ts(1)))
        Thread.sleep(200)
      }
      val all = kAlerts
      assert(all.exists(_.terminal), "cap must be reached after recovery")
      assert(all.count(_.terminal) == 1, "terminal alert fires exactly once")
      // the counter continued PAST the pre-restart progress (state, not
      // just offsets, survived), hit the cap, and never duplicated or
      // skipped a level across the restart
      assert(all.map(_.n_missed).max == cap)
      assert(all.map(_.n_missed).distinct.length == all.length,
        "no duplicate escalation level across the restart")
      assert(all.map(_.n_missed).toSet == (1L to cap).toSet,
        "no skipped escalation level across the restart")
      // retired: silent for 4+ intervals after the terminal alert (the
      // nudge key keeps batches flowing, so silence here is state
      // removal, not a stalled engine)
      val n = kAlerts.length
      (1 to 10).foreach { _ =>
        input.addData(Heartbeat("nudge", ts(1))); Thread.sleep(350)
      }
      assert(kAlerts.length == n, "retired key must emit no further alerts")
    } finally q2.stop()
  }
}
