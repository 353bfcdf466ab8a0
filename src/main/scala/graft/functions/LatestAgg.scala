package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed argmax-latest `Aggregator` (SURVEY.md §7.4's optional custom
  * aggregation tier): per group, keep the event with the greatest
  * (ts, eventId) — the T1/S3 "latest message" semantics as a single-pass
  * partial-aggregating UDAF instead of a row_number window. The window
  * form (q24) sorts each partition; this form reduces map-side to ONE
  * buffered row per key before the shuffle — at 100 TB that is the
  * difference between shuffling the table and shuffling one row per key.
  */
object LatestAgg {

  /** (ts-micros, eventId, payload) input row; payload rides along. */
  final case class Event(ts: Long, eventId: Long, payload: String)

  val latest: Aggregator[Event, Event, Event] =
    new Aggregator[Event, Event, Event] {
      private val MinEvent = Event(Long.MinValue, Long.MinValue, null)
      override def zero: Event = MinEvent
      private def max2(a: Event, b: Event): Event =
        if (a.ts > b.ts || (a.ts == b.ts && a.eventId >= b.eventId)) a else b
      override def reduce(buf: Event, e: Event): Event = max2(buf, e)
      override def merge(a: Event, b: Event): Event = max2(a, b)
      override def finish(r: Event): Event = r
      override def bufferEncoder: Encoder[Event] = Encoders.product[Event]
      override def outputEncoder: Encoder[Event] = Encoders.product[Event]
    }
}
