package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming._

import graft.streaming.HeartbeatMonitor.{Heartbeat, HbState, SilenceAlert}

/** [[HeartbeatMonitor]] on Spark 4's arbitrary-state API v2
  * (`transformWithState`) — same semantics (silence fires escalating
  * alerts, any heartbeat resets the count, `maxEscalations` retires the
  * key with one terminal alert), expressed with the API the operator
  * actually wants:
  *
  *  - the silence deadline is an explicit PER-KEY TIMER
  *    (`registerTimer`), re-armed on every heartbeat and on every
  *    sub-cap firing, DELETED outright at the cap — no overloading of a
  *    single implicit timeout slot;
  *  - state is named and typed (`ValueState[HbState]` + the pending
  *    timer's timestamp), and lives in the RocksDB provider off-heap —
  *    the 100 TB posture for fleets of monitored keys;
  *  - retirement is `state.clear()` + `deleteTimer`: a dead key costs
  *    nothing after its terminal alert, exactly like the fMGWS form.
  *
  * Kept alongside [[HeartbeatMonitor]] for the same reason as
  * [[OtpCorrelationTws]]: fMGWS remains the portable HDFS-state form;
  * this is the forward-looking one. Spec pins behavioral parity.
  */
object HeartbeatMonitorTws {

  class SilenceProcessor(silenceMs: Long, maxEscalations: Long)
      extends StatefulProcessor[String, Heartbeat, SilenceAlert] {

    @transient private var hb: ValueState[HbState] = _
    @transient private var timerAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      hb = getHandle.getValueState[HbState](
        "hb", Encoders.product[HbState], TTLConfig.NONE)
      timerAt = getHandle.getValueState[Long](
        "timerAt", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def rearm(timers: TimerValues): Unit = {
      if (timerAt.exists()) getHandle.deleteTimer(timerAt.get())
      val at = timers.getCurrentProcessingTimeInMs() + silenceMs
      getHandle.registerTimer(at)
      timerAt.update(at)
    }

    override def handleInputRows(key: String, rows: Iterator[Heartbeat],
        timers: TimerValues): Iterator[SilenceAlert] = {
      val newest = rows.map(_.ts).maxBy(_.getTime)
      val last = (if (hb.exists()) Some(hb.get()) else None).map(_.lastSeen)
        .filter(_.getTime > newest.getTime).getOrElse(newest)
      hb.update(HbState(last, 0L)) // any signal resets the escalation
      rearm(timers)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SilenceAlert] = {
      if (!hb.exists()) { timerAt.clear(); return Iterator.empty }
      val s = hb.get()
      val next = HbState(s.lastSeen, s.nMissed + 1)
      if (next.nMissed >= maxEscalations) {
        hb.clear()
        timerAt.clear()
        Iterator.single(
          SilenceAlert(key, next.lastSeen, next.nMissed, terminal = true))
      } else {
        hb.update(next)
        rearm(timers)
        Iterator.single(SilenceAlert(key, next.lastSeen, next.nMissed))
      }
    }
  }

  /** Requires the RocksDB state store provider (see OtpCorrelationTws). */
  def monitor(events: Dataset[Heartbeat], silenceMs: Long,
              maxEscalations: Long = Long.MaxValue)
             (implicit spark: SparkSession): Dataset[SilenceAlert] = {
    import spark.implicits._
    events.groupByKey(_.key)
      .transformWithState(new SilenceProcessor(silenceMs, maxEscalations),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
