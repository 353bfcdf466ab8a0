package graft.streaming

import java.sql.Timestamp

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpecBase
import graft.operators.EventOps
import graft.sources.Tables
import FunnelStream._

/** The streaming funnel state machine: transition unit tests
  * (TestGroupState), a multi-batch MemoryStream run, and — the load-bearing
  * check — exact parity between the streaming advances and the q76 batch
  * funnel over the whole sf0.001 events table. */
class FunnelStreamSpec extends SparkSpecBase {

  private def ts(s: Long) = new Timestamp(1704100000000L + s * 1000)
  private def ev(u: Long, t: String, at: Long) = UserEvent(u, t, ts(at))

  private def freshState = TestGroupState.create[FunnelState](
    optionalState = Optional.empty[FunnelState](),
    timeoutConf = GroupStateTimeout.NoTimeout(),
    batchProcessingTimeMs = 1000L,
    eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = false)

  test("advances only on the expected next stage, in event-time order") {
    val st = freshState
    // purchase/click arrive before any view → no advance
    val r1 = transition(None)(1L,
      Iterator(ev(1, "purchase", 5), ev(1, "click", 3)), st).toSeq
    assert(r1.isEmpty && !st.exists)
    // view, then a click out of order WITHIN the batch: sorted by ts the
    // click at 12 follows the view at 10 → two advances
    val r2 = transition(None)(1L,
      Iterator(ev(1, "click", 12), ev(1, "view", 10)), st).toSeq
    assert(r2.map(_.stage) == Seq(1, 2))
    assert(st.get == FunnelState(2, ts(12).getTime))
    // stale purchase (ts before the click advance) must NOT fire
    val r3 = transition(None)(1L, Iterator(ev(1, "purchase", 11)), st).toSeq
    assert(r3.isEmpty)
    val r4 = transition(None)(1L, Iterator(ev(1, "purchase", 13)), st).toSeq
    assert(r4.map(_.stage) == Seq(3))
  }

  test("equal-timestamp events never double-advance (strict >)") {
    val st = freshState
    val out = transition(None)(2L,
      Iterator(ev(2, "view", 10), ev(2, "click", 10)), st).toSeq
    assert(out.map(_.stage) == Seq(1), "same-ts click must not count")
  }

  test("idle timeout drops state (GC path)") {
    val armed = TestGroupState.create[FunnelState](
      optionalState = Optional.of(FunnelState(2, 123L)),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = true)
    val out = transition(Some(1000L))(3L, Iterator.empty, armed).toSeq
    assert(out.isEmpty && armed.isRemoved)
  }

  test("multi-batch MemoryStream: state persists across micro-batches") {
    implicit val s = spark
    import spark.implicits._
    val in = MemoryStream[UserEvent](spark)
    val q = funnel(in.toDS()).writeStream.format("memory")
      .queryName("funnel_out").outputMode("append").start()
    try {
      in.addData(ev(7, "view", 0), ev(8, "click", 0))
      q.processAllAvailable()
      in.addData(ev(7, "click", 5), ev(8, "view", 5))
      q.processAllAvailable()
      in.addData(ev(7, "purchase", 9), ev(8, "click", 9))
      q.processAllAvailable()
      val rows = spark.table("funnel_out")
        .as[FunnelAdvance].collect().toSet
      assert(rows == Set(
        FunnelAdvance(7, 1, ts(0)), FunnelAdvance(7, 2, ts(5)),
        FunnelAdvance(7, 3, ts(9)),
        FunnelAdvance(8, 1, ts(5)), FunnelAdvance(8, 2, ts(9))))
    } finally q.stop()
  }

  test("batch parity: streaming advances fold to the q76 result on sf0.001") {
    implicit val s = spark
    import spark.implicits._
    val events = Tables.events(spark, sf)
      .select(col("user_id").as("userId"), col("event_type").as("eventType"),
        col("ts"))
      .as[UserEvent].collect()
    val in = MemoryStream[UserEvent](spark)
    val q = funnel(in.toDS()).writeStream.format("memory")
      .queryName("funnel_parity").outputMode("append").start()
    try {
      // split the table into three micro-batches at arbitrary points —
      // parity must hold regardless of batch boundaries
      events.grouped(math.max(1, events.length / 3 + 1))
        .foreach { chunk => in.addData(chunk.toSeq); q.processAllAvailable() }
      val streamed = spark.table("funnel_parity").as[FunnelAdvance]
        .collect().groupBy(_.userId).map { case (u, adv) =>
          u -> adv.map(_.stage).max }
      val batch = EventOps.queries("q76_funnel_stages")(spark, sf)
        .collect().map(r =>
          r.getAs[Long]("user_id") -> r.getAs[Long]("stage").toInt).toMap
      // every user with stage >= 1 in batch must match the stream exactly;
      // stage-0 users emit nothing on the stream
      assert(batch.nonEmpty)
      batch.foreach { case (u, stage) =>
        assert(streamed.getOrElse(u, 0) == stage,
          s"user $u: stream=${streamed.get(u)} batch=$stage")
      }
      assert(streamed.keySet.subsetOf(batch.filter(_._2 >= 1).keySet))
    } finally q.stop()
  }
}
