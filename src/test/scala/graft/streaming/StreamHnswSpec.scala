package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.Hnsw
import graft.sources.Tables

/** Streaming maintenance of the HNSW graph artifact (StreamHnsw):
  * after every batch the maintained store must be BIT-IDENTICAL to a
  * from-scratch build over everything streamed so far (the append ≡
  * rebuild identity extended across a stream), replays and both crash
  * tear points must be absorbed, and the staleness guard must pass
  * between any two batches. */
class StreamHnswSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_shnsw_").toString

  private lazy val emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))

  private def slice(lo: Long, hi: Long): DataFrame =
    emb.filter(col("vec_id") >= lo && col("vec_id") < hi)

  private def storeRows(d: String): Seq[String] = spark.read
    .parquet(s"${Hnsw.indexGenDir(spark, d)}/nodes")
    .select(col("shard").cast("long"), col("node"), col("vec"),
      col("levels"))
    .collect().map(_.toString).sorted.toSeq

  test("maintained store ≡ from-scratch build after every batch") {
    val dir = tmp(); val ref = tmp()
    val cuts = Seq(0L, 40L, 70L, 100L)
    cuts.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      assert(StreamHnsw.maintainBatch(slice(lo, hi), i.toLong, dir,
        nShards = 4, m = 4, efConstruction = 8))
      Hnsw.writeIndex(slice(0L, hi), s"$ref/$i", nShards = 4, m = 4,
        efConstruction = 8)
      assert(storeRows(dir) == storeRows(s"$ref/$i"),
        s"maintained store diverged from a fresh build after batch $i")
      // the staleness guard passes for everything committed so far
      Hnsw.requireFresh(spark, dir, slice(0L, hi))
    }
  }

  test("replayed batch id skips via the ledger, even with different content") {
    val dir = tmp()
    assert(StreamHnsw.maintainBatch(slice(0L, 30L), 0L, dir,
      nShards = 2, m = 4, efConstruction = 8))
    assert(StreamHnsw.maintainBatch(slice(30L, 50L), 1L, dir))
    val before = storeRows(dir)
    // replay batch 1 with DIFFERENT content: the ledger must win
    assert(!StreamHnsw.maintainBatch(slice(50L, 80L), 1L, dir))
    assert(storeRows(dir) == before, "a replayed batch mutated the store")
  }

  test("tear point 1: crash between publish and ledger flip repairs on replay") {
    val dir = tmp()
    assert(StreamHnsw.maintainBatch(slice(0L, 30L), 0L, dir,
      nShards = 2, m = 4, efConstruction = 8))
    // simulate the crash: the append PUBLISHED but the ledger never
    // flipped — exactly what a kill between the two leaves behind
    Hnsw.appendToHnswIndex(spark, dir, slice(30L, 50L))
    val before = storeRows(dir)
    // the replay must detect the applied batch (one-id probe), flip
    // the ledger, and NOT re-append (which would fail the id contract)
    assert(!StreamHnsw.maintainBatch(slice(30L, 50L), 1L, dir))
    assert(storeRows(dir) == before)
    // and the stream continues normally afterwards
    assert(StreamHnsw.maintainBatch(slice(50L, 60L), 2L, dir))
    Hnsw.requireFresh(spark, dir, slice(0L, 60L))
  }

  test("tear point 2: a torn mid-append generation is GC'd, replay lands clean") {
    val dir = tmp(); val ref = tmp()
    assert(StreamHnsw.maintainBatch(slice(0L, 30L), 0L, dir,
      nShards = 2, m = 4, efConstruction = 8))
    // simulate a crash MID-append: a partial generation dir exists but
    // was never published (no sentinel, pointer untouched)
    val root = new org.apache.hadoop.fs.Path(dir)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val torn = new org.apache.hadoop.fs.Path(dir, "gen=99")
    hfs.mkdirs(new org.apache.hadoop.fs.Path(torn, "nodes"))
    val out = hfs.create(
      new org.apache.hadoop.fs.Path(torn, "nodes/garbage.bin"), true)
    out.write(Array[Byte](1, 2, 3)); out.close()
    // the replayed batch appends into a FRESH generation (names are
    // never reused) and the publish GCs the torn one
    assert(StreamHnsw.maintainBatch(slice(30L, 50L), 1L, dir))
    assert(!hfs.exists(torn), "the torn generation survived the publish")
    Hnsw.writeIndex(slice(0L, 50L), ref, nShards = 2, m = 4,
      efConstruction = 8)
    assert(storeRows(dir) == storeRows(ref))
  }

  test("a MIXED re-based batch fails loudly instead of dropping fresh ids") {
    // the tear-point-1 repair probes one id; if it hits but the batch
    // also carries FRESH ids (a re-based stream whose batch boundaries
    // shifted, or a second writer), skipping would silently drop them
    // — the whole-batch presence confirm must refuse loudly
    val dir = tmp()
    assert(StreamHnsw.maintainBatch(slice(0L, 30L), 0L, dir,
      nShards = 2, m = 4, efConstruction = 8))
    // simulate the re-base: ledger deleted, batchIds restart
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.delete(new org.apache.hadoop.fs.Path(dir, "_hnsw_applied"), false)
    // a PURE replay (all ids present) repairs silently...
    assert(!StreamHnsw.maintainBatch(slice(0L, 30L), 0L, dir))
    hfs.delete(new org.apache.hadoop.fs.Path(dir, "_hnsw_applied"), false)
    // ...but a mixed batch must refuse, not drop ids 30..40. The probe
    // samples ONE row nondeterministically, so force the hit: the
    // batch's first-collected row could be either side — run the call
    // and require that EITHER it threw the mixed-batch contract OR it
    // appended everything (the probe sampled a fresh id and the
    // append's own id contract then refuses the stale ids loudly)
    val mixed = slice(0L, 5L).union(slice(30L, 40L))
    val e = intercept[Exception](
      StreamHnsw.maintainBatch(mixed, 0L, dir))
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).filter(_ != null).toSeq
    assert(msgs.exists(m => m.contains("PARTIALLY present") ||
      m.contains("does not exceed")), e.toString)
    // nothing was silently skipped: the store is exactly batch 0
    val ref = tmp()
    Hnsw.writeIndex(slice(0L, 30L), ref, nShards = 2, m = 4,
      efConstruction = 8)
    assert(storeRows(dir) == storeRows(ref),
      "the refused mixed batch mutated the store")
  }

  test("same vec_id with two different vectors fails loudly, nothing publishes") {
    val dir = tmp()
    assert(StreamHnsw.maintainBatch(slice(0L, 20L), 0L, dir,
      nShards = 2, m = 4, efConstruction = 8))
    val before = storeRows(dir)
    val conflict = slice(20L, 21L)
      .union(slice(20L, 21L)
        .select(col("vec_id"),
          transform(col("embedding"), x => x + 1.0f).as("embedding")))
    val e = intercept[IllegalStateException](
      StreamHnsw.maintainBatch(conflict, 1L, dir))
    assert(e.getMessage.contains("no deterministic winner"), e.getMessage)
    assert(storeRows(dir) == before, "failed batch must not publish")
    // exact duplicate rows collapse silently (idempotent producer)
    assert(StreamHnsw.maintainBatch(
      slice(20L, 25L).union(slice(20L, 25L)), 1L, dir))
  }

  test("empty batches: no bootstrap on a fresh dir, a no-op afterwards") {
    val dir = tmp()
    assert(StreamHnsw.maintainBatch(slice(0L, 0L), 0L, dir,
      nShards = 2, m = 4, efConstruction = 8))
    intercept[IllegalStateException](Hnsw.indexGenDir(spark, dir))
    assert(StreamHnsw.maintainBatch(slice(0L, 20L), 1L, dir,
      nShards = 2, m = 4, efConstruction = 8))
    val before = storeRows(dir)
    assert(StreamHnsw.maintainBatch(slice(0L, 0L), 2L, dir))
    assert(storeRows(dir) == before)
    // the empty batch still advanced the ledger
    assert(!StreamHnsw.maintainBatch(slice(40L, 60L), 2L, dir))
  }

  test("end-to-end MemoryStream with kill-restart; probes stay exact") {
    val dir = tmp(); val ckpt = tmp()
    val in = MemoryStream[(Long, Seq[Float])](spark)
    def start() = StreamHnsw.maintain(
      in.toDF().toDF("vec_id", "embedding"), dir, ckpt,
      nShards = 2, m = 4, efConstruction = 8)
    def rowsOf(lo: Long, hi: Long): Seq[(Long, Seq[Float])] =
      slice(lo, hi).as[(Long, Seq[Float])].collect().toSeq
    var q = start()
    in.addData(rowsOf(0L, 30L): _*)
    q.processAllAvailable()
    in.addData(rowsOf(30L, 50L): _*)
    q.processAllAvailable()
    q.stop() // kill
    q = start() // restart from the checkpoint
    in.addData(rowsOf(50L, 70L): _*)
    q.processAllAvailable()
    q.stop()
    // the maintained artifact ≡ a from-scratch build over the stream
    val ref = tmp()
    Hnsw.writeIndex(slice(0L, 70L), ref, nShards = 2, m = 4,
      efConstruction = 8)
    assert(storeRows(dir) == storeRows(ref),
      "kill-restart maintenance diverged from a fresh build")
    // exhaustive probe over the maintained store ≡ brute force
    Hnsw.requireFresh(spark, dir, slice(0L, 70L))
    val qids = Seq(0L, 35L, 69L)
    val queries = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val got = Hnsw.searchStored(spark, dir, queries, k = 5,
      ef = Int.MaxValue, excludeSelf = true)
    val corpus = slice(0L, 70L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("dot").desc, col("vec_id"))
    val truth = corpus.crossJoin(broadcast(
        emb.filter(col("vec_id").isin(qids: _*))
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dot", graft.functions.VectorFns.dotExact(
        col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("vec_id"), col("dot"), col("rank"))
    def keyed(df: DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(keyed(got) == keyed(truth))
  }
}
