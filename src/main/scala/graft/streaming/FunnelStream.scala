package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the q76 ordered-sequence funnel: a per-user state
  * machine over an unbounded event stream that emits a row each time a user
  * ADVANCES a stage (view → click → purchase, strictly increasing event
  * time). Batch and stream share one definition of "advance", so the
  * streaming output folds to exactly the q76 batch result on the same data —
  * pinned by FunnelStreamSpec.
  *
  * Scale posture: one shuffle on user_id into the state store; per-user
  * state is two small fields (stage + last-advance ts) regardless of event
  * volume, and an optional processing-time idle timeout garbage-collects
  * users that went quiet — the same bounded-state design as OtpCorrelation
  * (SURVEY.md §2.9 ST3).
  */
object FunnelStream {

  /** Funnel stage sequence; index i advances stage i → i+1. */
  val Stages: IndexedSeq[String] = IndexedSeq("view", "click", "purchase")

  final case class UserEvent(
      userId: Long,
      eventType: String,
      ts: java.sql.Timestamp)

  /** GroupState payload: highest stage reached + when it was reached. */
  final case class FunnelState(stage: Int, lastAdvanceMs: Long)

  final case class FunnelAdvance(
      userId: Long,
      stage: Int,
      ts: java.sql.Timestamp)

  /** Pure transition: fold this batch's events (event-time order — micro-
    * batches don't sort for us) through the stage machine; emit one record
    * per advance. Strict `>` on the timestamp matches q76's strictly-after
    * join predicates, so equal-timestamp events can never double-advance. */
  def transition(gcIdleMs: Option[Long])(
      userId: Long,
      events: Iterator[UserEvent],
      state: GroupState[FunnelState]): Iterator[FunnelAdvance] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
    val out = scala.collection.mutable.ArrayBuffer.empty[FunnelAdvance]
    events.toSeq.sortBy(_.ts.getTime).foreach { ev =>
      if (st.stage < Stages.length && ev.eventType == Stages(st.stage) &&
          ev.ts.getTime > st.lastAdvanceMs) {
        st = FunnelState(st.stage + 1, ev.ts.getTime)
        out += FunnelAdvance(userId, st.stage, ev.ts)
      }
    }
    if (out.nonEmpty) state.update(st)
    // refresh the GC clock on any activity, advance or not
    if (state.exists) gcIdleMs.foreach(state.setTimeoutDuration)
    out.iterator
  }

  /** Wire the operator. `gcIdleMs = Some(ms)` arms a processing-time idle
    * timeout that drops a user's state after `ms` of silence (production
    * setting — bounded state); `None` disables it (lets tests drain with
    * `processAllAvailable`, which never quiesces under a timeout-armed
    * query). */
  def funnel(events: Dataset[UserEvent], gcIdleMs: Option[Long] = None)
            (implicit spark: SparkSession): Dataset[FunnelAdvance] = {
    import spark.implicits._
    val timeoutConf =
      if (gcIdleMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append(), timeoutConf)(transition(gcIdleMs))
  }
}
