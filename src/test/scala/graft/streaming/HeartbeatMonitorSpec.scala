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
}
