package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpecBase
import StreamMediaDedup._

/** Streaming perceptual dedup: transition unit tests (TestGroupState),
  * pigeonhole recall across micro-batches through a real MemoryStream,
  * and the cross-family composition — image fingerprints from the
  * batch MediaDedup corpus flowing through the streaming filter. */
class StreamMediaDedupSpec extends SparkSpecBase {
  import spark.implicits._

  import org.apache.spark.api.java.Optional
  private def freshState = TestGroupState.create[BucketState](
    optionalState = Optional.empty[BucketState](),
    timeoutConf = GroupStateTimeout.ProcessingTimeTimeout(),
    batchProcessingTimeMs = 1000L,
    eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = false)

  test("first arrival admits; close hash flags against the EARLIEST witness") {
    val st = freshState
    val h = 0x0123456789abcdefL
    val r1 = transition(3, 16)(0L, Iterator((10L, 0L, h)), st).toSeq
    assert(r1 == Seq(BandVerdict(10L, 0, None)))
    // same bucket, hamming 2 from the first → flagged; far hash admits
    val r2 = transition(3, 16)(0L,
      Iterator((30L, 0L, ~h), (20L, 0L, h ^ (1L << 60) ^ (1L << 61))), st)
      .toSeq
    // docId order within the batch: 20 processed before 30
    assert(r2 == Seq(BandVerdict(20L, 0, Some(10L)),
      BandVerdict(30L, 0, None)))
  }

  test("radius respected; bucket cap evicts oldest; timeout clears") {
    val st = freshState
    transition(0, 2)(0L, Iterator((1L, 0L, 100L)), st)
    val r = transition(0, 2)(0L, Iterator((2L, 0L, 101L)), st).toSeq
    assert(r.head.dupOf.isEmpty, "hamming 1 must not flag at radius 0")
    transition(0, 2)(0L, Iterator((3L, 0L, 200L)), st)
    assert(st.get.entries.length == 2)
    assert(!st.get.entries.map(_._1).contains(1L), "oldest evicted")
    val timedOut = TestGroupState.create[BucketState](
      optionalState = Optional.of(st.get),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 2000L,
      eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = true)
    assert(transition(3, 2)(0L, Iterator.empty, timedOut).isEmpty)
    assert(!timedOut.exists)
  }

  // ProcessingTimeTimeout queries never quiesce under
  // processAllAvailable (timeout checks schedule micro-batches
  // continuously) — poll the memory sink with a deadline instead
  private def awaitRows(table: String, atLeast: Long): Unit = {
    val deadline = System.currentTimeMillis() + 60000
    while (spark.table(table).count() < atLeast &&
           System.currentTimeMillis() < deadline) Thread.sleep(200)
    assert(spark.table(table).count() >= atLeast,
      s"$table stuck below $atLeast rows")
  }

  test("end-to-end: later-batch near-dups flag against earlier state; resolve picks min witness") {
    val in = MemoryStream[MediaEvent](spark)
    val q = bandVerdicts(in.toDS()).writeStream
      .format("memory").queryName("smd_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("500 milliseconds"))
      .start()
    try {
      val h1 = 0x1111222233334444L
      val far = 0x8888777766665555L
      in.addData(MediaEvent(1L, h1), MediaEvent(2L, far))
      awaitRows("smd_out", 8) // 2 docs x 4 bands
      // batch 2: hamming-2 variant of h1 (split across two bands), an
      // exact copy of far, and something unrelated
      in.addData(MediaEvent(3L, h1 ^ (1L << 5) ^ (1L << 50)),
        MediaEvent(4L, far), MediaEvent(5L, 0x00ff00ff00ff00ffL))
      awaitRows("smd_out", 20)
      val resolved = resolve(spark.table("smd_out").as[BandVerdict])
        .collect().toMap
      assert(resolved(1L).isEmpty && resolved(2L).isEmpty)
      assert(resolved(3L).contains(1L), s"got ${resolved.get(3L)}")
      assert(resolved(4L).contains(2L))
      assert(resolved(5L).isEmpty)
    } finally q.stop()
  }

  test("cross-family composition: batch image fingerprints through the streaming filter") {
    // the planted brightness-shifted copies (identical aHash by the
    // invariance theorem) must flag against their originals when they
    // arrive in a LATER micro-batch
    import graft.operators.MediaDedup
    val hashes = MediaDedup.imageHashes(
        MediaDedup.plantedImageTable(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val originals = hashes.keys.filter(_ < 1000000L).toSeq.sorted
    val copies = hashes.keys.filter(_ >= 1000000L).toSeq.sorted
    assert(copies.nonEmpty)
    val in = MemoryStream[MediaEvent](spark)
    val q = bandVerdicts(in.toDS()).writeStream
      .format("memory").queryName("smd_img").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("500 milliseconds"))
      .start()
    try {
      in.addData(originals.map(id => MediaEvent(id, hashes(id))): _*)
      awaitRows("smd_img", originals.size * 4L)
      in.addData(copies.map(id => MediaEvent(id, hashes(id))): _*)
      awaitRows("smd_img", (originals.size + copies.size) * 4L)
      val resolved = resolve(spark.table("smd_img").as[BandVerdict])
        .collect().toMap
      copies.foreach { c =>
        assert(resolved(c).isDefined, s"shifted copy $c not flagged")
      }
    } finally q.stop()
  }
}
