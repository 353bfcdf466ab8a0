package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import graft.SparkSpecBase
import StreamDedup._

/** Streaming near-dup filter: transition unit tests (TestGroupState) + an
  * end-to-end MemoryStream run checking that exact duplicates arriving in a
  * later micro-batch are flagged against state from an earlier one. */
class StreamDedupSpec extends SparkSpecBase {

  import org.apache.spark.api.java.Optional
  private def freshState = TestGroupState.create[BucketState](
    optionalState = Optional.empty[BucketState](),
    timeoutConf = GroupStateTimeout.ProcessingTimeTimeout(),
    batchProcessingTimeMs = 1000L,
    eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = false)

  private val sigA = Array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)
  private val sigB = Array(9L, 9L, 9L, 9L, 9L, 9L, 9L, 9L)
  private def halfA = Array(1L, 2L, 3L, 4L, 50L, 60L, 70L, 80L) // est J = 0.5

  test("first arrival admits; identical signature flags against the earliest") {
    val st = freshState
    val r1 = transition(0.5, 16)("bk", Iterator(("bk", 10L, 0, sigA)), st).toSeq
    assert(r1 == Seq(BandVerdict(10L, 0, None)))
    val r2 = transition(0.5, 16)(
      "bk", Iterator(("bk", 20L, 0, sigA), ("bk", 30L, 0, sigB)), st).toSeq
    assert(r2 == Seq(BandVerdict(20L, 0, Some(10L)), BandVerdict(30L, 0, None)))
  }

  test("threshold respected: half-agreeing signature flags at 0.5, not at 0.9") {
    val st1 = freshState
    transition(0.5, 16)("bk", Iterator(("bk", 1L, 0, sigA)), st1)
    val r = transition(0.5, 16)("bk", Iterator(("bk", 2L, 0, halfA)), st1).toSeq
    assert(r.head.dupOf.contains(1L))
    val st2 = freshState
    transition(0.9, 16)("bk", Iterator(("bk", 1L, 0, sigA)), st2)
    val r2 = transition(0.9, 16)("bk", Iterator(("bk", 2L, 0, halfA)), st2).toSeq
    assert(r2.head.dupOf.isEmpty)
  }

  test("bucket cap evicts oldest; timeout clears state") {
    val st = freshState
    (1L to 3L).foreach(i =>
      transition(0.99, 2)("bk",
        Iterator(("bk", i, 0, Array.fill(8)(i * 100))), st))
    assert(st.get.entries.length == 2)
    assert(!st.get.entries.map(_._1).contains(1L)) // oldest evicted
    val timedOut = TestGroupState.create[BucketState](
      optionalState = Optional.of(st.get),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 2000L,
      eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = true)
    val r = transition(0.5, 2)("bk", Iterator.empty, timedOut).toSeq
    assert(r.isEmpty && timedOut.isRemoved)
  }

  test("e2e: duplicates across micro-batches are flagged; resolve() is per-doc OR") {
    implicit val s = spark
    import s.implicits._
    val input = MemoryStream[DocEvent](spark)
    val q = StreamDedup.bandVerdicts(input.toDS(), threshold = 0.99)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
      .start()
    try {
      val t1 = "the quick brown fox jumps over the lazy dog again and again"
      val t2 = "completely different content with many other words in this line"
      input.addData(DocEvent(1, t1), DocEvent(2, t2))
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("dedup_out").count() < 8 && // 2 docs × 4 bands
             System.currentTimeMillis() < deadline) Thread.sleep(200)
      // batch 2: an exact copy of t1 and a fresh doc
      input.addData(DocEvent(3, t1), DocEvent(4,
        "yet another entirely unrelated document body with fresh tokens"))
      while (spark.table("dedup_out").count() < 16 &&
             System.currentTimeMillis() < deadline) Thread.sleep(200)
      val verdicts = spark.table("dedup_out").as[BandVerdict]
      val resolved = StreamDedup.resolve(verdicts).collect().toMap
      assert(resolved(1L).isEmpty && resolved(2L).isEmpty && resolved(4L).isEmpty)
      assert(resolved(3L).contains(1L), s"doc 3 should dup doc 1: $resolved")
    } finally q.stop()
  }
}
