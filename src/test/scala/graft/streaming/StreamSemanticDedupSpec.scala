package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpecBase
import graft.operators.VectorOps

/** Ingest-time semantic dedup over the persistent IVF index: the
  * arrival-order greedy policy across micro-batches, exactly-once
  * decision publishing, replay/redelivery idempotency, and the
  * MemoryStream end-to-end run.
  *
  * Config uses nprobe = cells so every probe is exhaustive — the policy
  * itself (not ANN recall) is what these tests pin; recall contracts
  * live in IvfIndexSpec. */
class StreamSemanticDedupSpec extends SparkSpecBase {
  import spark.implicits._

  // deterministic distinct vectors: uniform(-1,1), pairwise cosine far
  // below the 0.99 gate (copies are the only witnesses possible)
  private val rnd = new scala.util.Random(41L)
  private val vecs: Map[Int, Seq[Float]] =
    (0 until 32).map(i => i -> Seq.fill(64)(rnd.nextFloat() * 2f - 1f)).toMap

  private def df(rows: (Long, Int)*): DataFrame =
    rows.map { case (id, v) => (id, vecs(v)) }.toDF("vec_id", "embedding")

  private def mkCfg(): StreamSemanticDedup.Config = {
    val root = java.nio.file.Files.createTempDirectory("semdedup").toString
    StreamSemanticDedup.Config(
      indexPath = s"$root/index", outDir = s"$root/out",
      k = 3, nprobe = 4, threshold = 0.99, cells = 4, retrainCells = 4)
  }

  private def decisions(cfg: StreamSemanticDedup.Config, batchId: Long) =
    spark.read.parquet(s"${cfg.outDir}/v=$batchId")
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

  private def indexIds(cfg: StreamSemanticDedup.Config): Set[Long] =
    VectorOps.ivfIndexIds(spark, cfg.indexPath)
      .collect().map(_.getLong(0)).toSet

  test("arrival-order greedy across batches: index witnesses + within-batch id order") {
    val cfg = mkCfg()
    // batch 0: ten distinct vectors found the index
    StreamSemanticDedup.processBatch(
      df((0L to 9L).map(i => (i, i.toInt)): _*), 0L, cfg)
    assert(decisions(cfg, 0L) == (0L to 9L).map((_, true, -1L)).toSet)
    assert(indexIds(cfg) == (0L to 9L).toSet)

    // batch 1: 10 copies v0 (stored witness), 11 new, 12 copies 11
    // (within-batch witness, smaller id), 13 new
    StreamSemanticDedup.processBatch(
      df((10L, 0), (11L, 11), (12L, 11), (13L, 13)), 1L, cfg)
    assert(decisions(cfg, 1L) == Set(
      (10L, false, 0L), (11L, true, -1L), (12L, false, 11L),
      (13L, true, -1L)))
    assert(indexIds(cfg) == (0L to 9L).toSet + 11L + 13L)

    // batch 2: 14 copies v11 — its earlier twin 12 was DROPPED (never
    // indexed), so the witness is the kept 11; 15 copies v0; 16 new
    StreamSemanticDedup.processBatch(
      df((14L, 11), (15L, 0), (16L, 16)), 2L, cfg)
    assert(decisions(cfg, 2L) == Set(
      (14L, false, 11L), (15L, false, 0L), (16L, true, -1L)))
    assert(indexIds(cfg) == (0L to 9L).toSet + 11L + 13L + 16L)
  }

  test("replay is a no-op; published decisions are the source of truth") {
    val cfg = mkCfg()
    StreamSemanticDedup.processBatch(
      df((0L to 5L).map(i => (i, i.toInt)): _*), 0L, cfg)
    val b1 = df((6L, 0), (7L, 7))
    StreamSemanticDedup.processBatch(b1, 1L, cfg)
    val files1 = new java.io.File(s"${cfg.outDir}/v=1")
      .listFiles().map(_.getName).toSet
    val ids1 = indexIds(cfg)
    // full replay of the committed batch: decision files untouched
    // (publish-once), no duplicate index rows
    StreamSemanticDedup.processBatch(b1, 1L, cfg)
    assert(new java.io.File(s"${cfg.outDir}/v=1")
      .listFiles().map(_.getName).toSet == files1)
    assert(indexIds(cfg) == ids1)
    assert(VectorOps.ivfIndexIds(spark, cfg.indexPath).count() ==
      ids1.size.toLong, "replayed append duplicated a vec_id")

    // tear between decisions-publish and append: manufacture published
    // decisions that DISAGREE with a recompute (8 marked dropped) — the
    // replay must derive the append from the published files, not from
    // re-deciding, so 8 never reaches the index
    Seq((8L, false, Some(0L)), (9L, true, Option.empty[Long]))
      .toDF("vec_id", "kept", "dup_of")
      .write.parquet(s"${cfg.outDir}/v=2")
    StreamSemanticDedup.processBatch(df((8L, 20), (9L, 21)), 2L, cfg)
    assert(decisions(cfg, 2L) == Set((8L, false, 0L), (9L, true, -1L)))
    assert(indexIds(cfg) == ids1 + 9L)
  }

  test("at-least-once redelivery of an already-kept id is absorbed") {
    val cfg = mkCfg()
    StreamSemanticDedup.processBatch(
      df((0L to 4L).map(i => (i, i.toInt)): _*), 0L, cfg)
    // id 2 arrives AGAIN in a later batch (an at-least-once source):
    // its own stored copy is excluded from the candidate set, so the
    // decision stays kept — and the id-ledger anti-join keeps the
    // append from minting a duplicate physical row
    StreamSemanticDedup.processBatch(df((2L, 2), (5L, 5)), 1L, cfg)
    assert(decisions(cfg, 1L) == Set((2L, true, -1L), (5L, true, -1L)))
    assert(indexIds(cfg) == (0L to 5L).toSet)
    assert(VectorOps.ivfIndexIds(spark, cfg.indexPath).count() == 6L)
  }

  test("within-batch redelivery of the same row is absorbed; conflicting vectors throw") {
    val cfg = mkCfg()
    // the same (id, vector) row twice in ONE batch: one decision row,
    // one appended copy
    StreamSemanticDedup.processBatch(
      df((0L, 0), (0L, 0), (1L, 1)), 0L, cfg)
    assert(decisions(cfg, 0L) == Set((0L, true, -1L), (1L, true, -1L)))
    assert(VectorOps.ivfIndexIds(spark, cfg.indexPath).count() == 2L)
    // same id, DIFFERENT vectors: no deterministic policy exists — the
    // batch must fail loudly before anything publishes
    val ex = intercept[IllegalArgumentException] {
      StreamSemanticDedup.processBatch(df((7L, 7), (7L, 8)), 1L, cfg)
    }
    assert(ex.getMessage.contains("conflicting vectors"))
    assert(!new java.io.File(s"${cfg.outDir}/v=1").exists(),
      "a failed batch published decisions")
  }

  test("drift retrain mid-stream: the rebuilt generation keeps serving witnesses") {
    val cfg = mkCfg().copy(retrainThreshold = 0.3)
    StreamSemanticDedup.processBatch(
      df((0L to 9L).map(i => (i, i.toInt)): _*), 0L, cfg)
    val gen0 = VectorOps.indexGenDir(spark, cfg.indexPath)
    // 5 appended / 10 trained = 50% mass growth > 0.3 → the append path
    // retrains and publishes a NEW generation mid-stream
    StreamSemanticDedup.processBatch(
      df((10L, 10), (11L, 11), (12L, 12), (13L, 13), (14L, 14)), 1L, cfg)
    val gen1 = VectorOps.indexGenDir(spark, cfg.indexPath)
    assert(gen1 != gen0, "mass growth above the threshold must retrain")
    // the superseded generation keeps its one-cycle reader grace
    assert(new java.io.File(gen0).exists())
    // the retrained quantizer serves the same live relation: stored
    // witnesses (including pre-retrain rows) still kill copies
    StreamSemanticDedup.processBatch(df((15L, 10), (16L, 16)), 2L, cfg)
    assert(decisions(cfg, 2L) == Set((15L, false, 10L), (16L, true, -1L)))
    assert(indexIds(cfg) == (0L to 14L).toSet + 16L)
  }

  test("e2e over MemoryStream: three micro-batches, survivors only") {
    val cfg = mkCfg()
    val mem = MemoryStream[(Long, Seq[Float])](spark)
    val q = StreamSemanticDedup.start(
      mem.toDF().toDF("vec_id", "embedding"), cfg,
      java.nio.file.Files.createTempDirectory("semckpt").toString)
    try {
      mem.addData((0L, vecs(0)), (1L, vecs(1)), (2L, vecs(2)))
      q.processAllAvailable()
      mem.addData((3L, vecs(0)), (4L, vecs(4)))
      q.processAllAvailable()
      mem.addData((5L, vecs(4)), (6L, vecs(6)))
      q.processAllAvailable()
      assert(indexIds(cfg) == Set(0L, 1L, 2L, 4L, 6L))
      assert(decisions(cfg, 1L) == Set((3L, false, 0L), (4L, true, -1L)))
      assert(decisions(cfg, 2L) == Set((5L, false, 4L), (6L, true, -1L)))
    } finally q.stop()
  }
}
