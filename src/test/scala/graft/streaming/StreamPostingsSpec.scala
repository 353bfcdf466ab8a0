package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpecBase
import graft.operators.Retrieval

/** Streaming postings maintenance (streaming/StreamPostings): after any
  * prefix of micro-batches, a stored probe must equal the batch
  * phraseSearch over the LATEST version of every doc seen so far —
  * upserts shadow earlier versions, replayed batch ids are no-ops, and
  * a mid-stream full rebuild (compaction) composes. */
class StreamPostingsSpec extends SparkSpecBase {
  import spark.implicits._

  private def asMap(df: DataFrame): Map[Long, (Long, Long)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private def probe(dir: String, phrase: Seq[String]) =
    asMap(Retrieval.phraseSearchStored(spark, dir, phrase))

  private def expect(corpus: Seq[(Long, String)], phrase: Seq[String]) =
    asMap(Retrieval.phraseSearch(corpus.toDF("doc_id", "text"), phrase))

  private val phrases = Seq(Seq("a", "b"), Seq("z", "z"), Seq("b"))

  private def checkAll(dir: String, corpus: Seq[(Long, String)]): Unit =
    for (ph <- phrases)
      assert(probe(dir, ph) == expect(corpus, ph),
        s"stored probe diverged from the latest corpus for $ph")

  test("maintained artifact ≡ latest corpus after every micro-batch") {
    val dir = s"/tmp/graft_test_spost_${System.nanoTime()}"
    val ckpt = s"/tmp/graft_test_spost_ck_${System.nanoTime()}"
    val hp = new org.apache.hadoop.fs.Path(dir)
    val hfs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamPostings.maintain(
      input.toDF().toDF("doc_id", "text"), dir, ckpt, nBuckets = 16)
    try {
      input.addData((1L, "a b a"), (2L, "x y"))
      q.processAllAvailable()
      checkAll(dir, Seq(1L -> "a b a", 2L -> "x y"))
      // batch 2: NEW doc + an UPDATE of doc 1 — old postings must die
      input.addData((1L, "z z"), (3L, "a b"))
      q.processAllAvailable()
      checkAll(dir, Seq(1L -> "z z", 2L -> "x y", 3L -> "a b"))
      // batch 3: update the update (two tombstone layers deep)
      input.addData((1L, "a b a b"))
      q.processAllAvailable()
      checkAll(dir, Seq(1L -> "a b a b", 2L -> "x y", 3L -> "a b"))
    } finally {
      q.stop()
      hfs.delete(hp, true)
      hfs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
    }
  }

  test("replayed batch ids are idempotent; torn staging debris clears") {
    val dir = s"/tmp/graft_test_spost_rp_${System.nanoTime()}"
    val hp = new org.apache.hadoop.fs.Path(dir)
    val hfs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val b0 = Seq(1L -> "a b a", 2L -> "x y").toDF("doc_id", "text")
      val b1 = Seq(1L -> "z z").toDF("doc_id", "text")
      assert(StreamPostings.maintainBatch(b0, 0L, dir, nBuckets = 16))
      assert(StreamPostings.maintainBatch(b1, 1L, dir))
      val before = phrases.map(ph => probe(dir, ph))
      // replay BOTH batch ids (kill-after-publish-before-checkpoint):
      // skip, and nothing changes
      assert(!StreamPostings.maintainBatch(b0, 0L, dir))
      assert(!StreamPostings.maintainBatch(b1, 1L, dir))
      assert(phrases.map(ph => probe(dir, ph)) == before,
        "a replayed batch changed the artifact")
      // torn attempt: staged-but-unpublished debris for batch 2, then
      // the replay publishes cleanly
      val gen = Retrieval.postingsGenDir(spark, dir)
      val tmp = new org.apache.hadoop.fs.Path(gen, ".append_tmp_b000000000002")
      hfs.mkdirs(tmp)
      assert(StreamPostings.maintainBatch(
        Seq(3L -> "a b").toDF("doc_id", "text"), 2L, dir))
      checkAll(dir, Seq(1L -> "z z", 2L -> "x y", 3L -> "a b"))
    } finally hfs.delete(hp, true)
  }

  test("mid-stream rebuild (compaction) composes with later batches") {
    val dir = s"/tmp/graft_test_spost_cp_${System.nanoTime()}"
    val hp = new org.apache.hadoop.fs.Path(dir)
    val hfs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      StreamPostings.maintainBatch(
        Seq(1L -> "a b a", 2L -> "x y").toDF("doc_id", "text"), 0L, dir,
        nBuckets = 16)
      StreamPostings.maintainBatch(
        Seq(1L -> "z z").toDF("doc_id", "text"), 1L, dir)
      // maintenance-window compaction: rebuild from the latest corpus
      val latest = Seq(1L -> "z z", 2L -> "x y")
      Retrieval.writePostings(latest.toDF("doc_id", "text"), dir,
        nBuckets = 16)
      // stream continues with fresh batch ids against the new generation
      assert(StreamPostings.maintainBatch(
        Seq(3L -> "a b", 2L -> "x y b").toDF("doc_id", "text"), 2L, dir))
      checkAll(dir, Seq(1L -> "z z", 2L -> "x y b", 3L -> "a b"))
    } finally hfs.delete(hp, true)
  }

  test("within-batch redelivery dedupes; same-id conflict fails loudly") {
    val dir = s"/tmp/graft_test_spost_dup_${System.nanoTime()}"
    val hp = new org.apache.hadoop.fs.Path(dir)
    val hfs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      // the same row twice in one batch (at-least-once within a batch):
      // served ONCE — duplicated posting rows would break the anchor
      // law and the phrase would silently stop matching
      assert(StreamPostings.maintainBatch(
        Seq(1L -> "a b a", 1L -> "a b a", 2L -> "x y")
          .toDF("doc_id", "text"), 0L, dir, nBuckets = 8))
      assert(probe(dir, Seq("a", "b", "a")) ==
        expect(Seq(1L -> "a b a", 2L -> "x y"), Seq("a", "b", "a")),
        "a redelivered row double-posted and broke the anchor count")
      // same id, DIFFERENT texts in one batch: no deterministic winner
      val e = intercept[IllegalStateException] {
        StreamPostings.maintainBatch(
          Seq(3L -> "p q", 3L -> "q p").toDF("doc_id", "text"), 1L, dir)
      }
      assert(e.getMessage.contains("conflicting texts"))
      // and the refused batch published NOTHING (tag absent → replayable)
      assert(probe(dir, Seq("p", "q")).isEmpty)
      assert(StreamPostings.maintainBatch(
        Seq(3L -> "p q").toDF("doc_id", "text"), 1L, dir),
        "the fixed batch must publish under the same id")
      assert(probe(dir, Seq("p", "q")) ==
        expect(Seq(3L -> "p q"), Seq("p", "q")))
    } finally hfs.delete(hp, true)
  }

  test("batch order wins over within-batch duplicates across updates") {
    // zero-padded tags: batch 10 must shadow batch 9 even though "b9"
    // sorts after "b10" unpadded
    val dir = s"/tmp/graft_test_spost_pad_${System.nanoTime()}"
    val hp = new org.apache.hadoop.fs.Path(dir)
    val hfs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      StreamPostings.maintainBatch(
        Seq(1L -> "seed doc").toDF("doc_id", "text"), 0L, dir, nBuckets = 8)
      for (i <- 1L to 10L)
        StreamPostings.maintainBatch(
          Seq(1L -> s"version v$i here").toDF("doc_id", "text"), i, dir)
      assert(probe(dir, Seq("version", "v10", "here")) ==
        expect(Seq(1L -> "version v10 here"), Seq("version", "v10", "here")),
        "batch 10 did not shadow batch 9 — tag padding broke layer order")
      assert(probe(dir, Seq("v9")).isEmpty, "an old version survived")
    } finally hfs.delete(hp, true)
  }
}
