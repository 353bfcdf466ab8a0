package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase
import graft.streaming.HeartbeatMonitor.{Heartbeat, SilenceAlert}

/** Behavioral parity of the transformWithState silence monitor with the
  * fMGWS [[HeartbeatMonitor]]: escalation, reset-on-signal, and the
  * terminal cap, under the RocksDB state store provider. */
class HeartbeatMonitorTwsSpec extends SparkSpecBase {

  private def ts(s: Long) = new Timestamp(1704100000000L + s * 1000)

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

  test("tws: silent key escalates to the cap, emits one terminal, then stays dark") {
    withRocksDb { implicit s =>
      import s.implicits._
      val input = MemoryStream[Heartbeat](s)
      val cap = 3L
      val q = HeartbeatMonitorTws.monitor(input.toDS(), silenceMs = 600L,
          maxEscalations = cap)
        .writeStream.format("memory").queryName("hbtws_out")
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("250 milliseconds"))
        .start()
      try {
        input.addData(Heartbeat("k", ts(0)))
        val deadline = System.currentTimeMillis() + 90000
        def kAlerts = s.table("hbtws_out").as[SilenceAlert].collect()
          .filter(_.key == "k")
        while (!kAlerts.exists(_.terminal) &&
          System.currentTimeMillis() < deadline) {
          // keep a second key chatty: proves alerts are per-key and keeps
          // batches flowing
          input.addData(Heartbeat("chatty", ts(1)))
          Thread.sleep(200)
        }
        val all = kAlerts
        assert(all.exists(_.terminal), "cap must be reached")
        assert(all.count(_.terminal) == 1)
        assert(all.map(_.n_missed).sorted.toSeq == (1L to cap).toSeq,
          "escalation levels must be exactly 1..cap, no dup or skip")
        assert(all.forall(_.last_seen == ts(0)))
        // retired: no further alerts for k while batches keep running
        val n = all.length
        (1 to 8).foreach { _ =>
          input.addData(Heartbeat("chatty", ts(1))); Thread.sleep(250)
        }
        assert(kAlerts.length == n, "retired key must stay dark")
      } finally q.stop()
    }
  }

  test("tws: a heartbeat resets the escalation count") {
    withRocksDb { implicit s =>
      import s.implicits._
      val input = MemoryStream[Heartbeat](s)
      val q = HeartbeatMonitorTws.monitor(input.toDS(), silenceMs = 700L)
        .writeStream.format("memory").queryName("hbtws_reset")
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("250 milliseconds"))
        .start()
      try {
        input.addData(Heartbeat("r", ts(0)))
        val deadline = System.currentTimeMillis() + 60000
        def alerts = s.table("hbtws_reset").as[SilenceAlert].collect()
          .filter(_.key == "r")
        while (alerts.isEmpty &&
          System.currentTimeMillis() < deadline) Thread.sleep(150)
        assert(alerts.nonEmpty, "first silence alert must fire")
        // speak again: the NEXT alert (after renewed silence) must be
        // n_missed = 1 again, not a continuation
        input.addData(Heartbeat("r", ts(100)))
        // Wait for an alert WITNESSING the new heartbeat (last_seen ==
        // ts(100)) — not mere length growth: while "r" is still silent
        // the monitor legitimately keeps escalating the OLD silence
        // (n_missed = 2, 3, …) every ~700 ms, and under a loaded box one
        // of those can land before the ts(100) heartbeat is processed.
        val dl2 = System.currentTimeMillis() + 60000
        def post = alerts.filter(_.last_seen == ts(100))
        while (post.isEmpty &&
          System.currentTimeMillis() < dl2) Thread.sleep(150)
        assert(post.nonEmpty, "an alert for the renewed silence must fire")
        val fresh = post.minBy(_.n_missed)
        assert(fresh.n_missed == 1L,
          s"escalation must reset after a heartbeat, got ${fresh.n_missed}")
      } finally q.stop()
    }
  }
}
