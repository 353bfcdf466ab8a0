package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** The IVF-at-scale contract: the written index probes as a
  * partition-PRUNED read, cell count scales ≈ √N by default, and the
  * recall/cost curve is pinned — high recall at low nprobe on clustered
  * data (where a quantizer can help), scan-fraction recall on uniform
  * data (where nothing can), exact search when every cell is probed. */
class IvfIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def topkSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("written index: probe is partition-pruned and reproduces the in-memory search") {
    val path = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    val corpus = graft.sources.Tables.embeddings(spark, sf)
    VectorOps.writeIvfIndex(corpus, path, cells = 8)
    val gen = VectorOps.indexGenDir(spark, path)
    // 8 cell directories on disk, inside the published generation
    val dirs = new java.io.File(s"$gen/corpus").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).sorted
    assert(dirs.length == 8, s"expected 8 cell partitions, got ${dirs.toSeq}")
    val probed = VectorOps.probeIvfIndex(spark, path, nprobe = 3)
    // identical result to the fully in-memory pipeline (training is
    // exact-integer deterministic, so write → read → probe loses nothing)
    assert(probed.collect().toSeq ==
      VectorOps.ivfTopK(spark, sf, nprobe = 3, cells = 8).collect().toSeq)
    // plan pin: the corpus scan carries a cell partition filter — the
    // probe opens nprobe-worth of directories, it does not scan-and-filter
    val scan = spark.read.parquet(s"$gen/corpus")
      .filter(col("cell").isin(0L, 1L, 2L))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"probe read is not partition-pruned:\n$plan")
    // the files the scan actually selected (inputFiles ignores pruning)
    val scanExec = scan.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val listing = scanExec.selectedPartitions
    assert(listing.partitionCount == 3,
      s"expected 3 selected cell partitions, got ${listing.partitionCount}")
    val files = listing.toPartitionArray.map(_.filePath.toString)
    assert(files.nonEmpty && files.forall(f =>
        f.contains("cell=0") || f.contains("cell=1") || f.contains("cell=2")),
      s"scan selected files outside the probed cell directories: ${files.toSeq}")
  }

  test("cells defaults to ~sqrt(N) when unspecified") {
    val corpus = graft.sources.Tables.embeddings(spark, sf) // 500 rows
    val r = VectorOps.ivfTopKFrom(corpus, nprobe = 3) // cells = 0 → auto
    assert(r.groupBy($"qid").count().collect().forall(_.getLong(1) == 5))
    val path = java.nio.file.Files.createTempDirectory("ivf_auto").toString
    VectorOps.writeIvfIndex(corpus, path) // auto cells
    val dirs = new java.io.File(
        s"${VectorOps.indexGenDir(spark, path)}/corpus").listFiles()
      .count(_.getName.startsWith("cell="))
    // √500 ≈ 22.4 → 22 trained cells (empty cells may collapse, so allow
    // a small deficit but reject the old constant-8 sizing)
    assert(dirs >= 16 && dirs <= 23, s"expected ~22=√500 cells, got $dirs")
  }

  test("recall sweep on the uniform corpus: scan-fraction curve, exact at nprobe=cells") {
    val exact = topkSet(VectorOps.dotTopK(spark, sf))
    def recallAt(np: Int): Double = {
      val got = topkSet(VectorOps.ivfTopK(spark, sf, nprobe = np, cells = 8))
      (exact & got).size.toDouble / exact.size
    }
    // uniform random embeddings have no cluster structure: recall tracks
    // the probed fraction (measured 0.36/0.60/0.84/1.00 at 1/3/7/8 —
    // deterministic, every quantizer step is exact-integer arithmetic)
    val r1 = recallAt(1); val r3 = recallAt(3); val r7 = recallAt(7)
    assert(r1 < r3 && r3 < r7, s"recall not increasing: $r1 $r3 $r7")
    assert(r3 >= 0.5, s"nprobe=3 recall $r3 under pinned 0.5 (measured 0.6)")
    assert(r7 >= 0.8, s"nprobe=7 recall $r7 under pinned 0.8 (measured 0.84)")
    assert(recallAt(8) == 1.0,
      "probing every cell IS the exact search — recall must be exactly 1")
  }

  test("external query vectors: held-out searches against a written index") {
    // the real ANN shape: queries are NOT rows of the indexed corpus
    val path = java.nio.file.Files.createTempDirectory("ivf_ext").toString
    val all = graft.sources.Tables.embeddings(spark, sf)
    val corpus = all.filter($"vec_id" >= 10L)
    val queries = all.filter($"vec_id" < 10L)
      .select($"vec_id".as("qid"), $"embedding")
    VectorOps.writeIvfIndex(corpus, path, cells = 8)
    // probing EVERY cell is the exact search: must equal brute force
    // bit-for-bit (dot is the exact-decimal value, ordering fully pinned)
    val allCells = VectorOps.probeIvfIndex(spark, path, queries,
      k = 5, nprobe = 8)
    val brute = VectorOps.dotTopKWith(corpus, queries, k = 5)
    assert(allCells.collect().toSeq == brute.collect().toSeq,
      "nprobe=cells external search must reproduce brute force exactly")
    // the in-memory form agrees with the written-index form
    val inMem = VectorOps.ivfSearch(corpus, queries, k = 5, nprobe = 8,
      cells = 8)
    assert(inMem.collect().toSeq == brute.collect().toSeq)
    // partial probe: still a valid top-k over the probed cells, recall
    // tracks the scan fraction on uniform data
    val partial = VectorOps.probeIvfIndex(spark, path, queries,
      k = 5, nprobe = 3)
    val bSet = topkSet(brute); val pSet = topkSet(partial)
    val recall = (bSet & pSet).size.toDouble / bSet.size
    assert(partial.groupBy($"qid").count().collect()
      .forall(_.getLong(1) == 5), "every query must return k rows")
    assert(recall >= 0.2 && recall <= 1.0, s"implausible recall $recall")
    // plan pin: the external probe reads ONLY the probed cell directories
    val two = queries.filter($"qid" < 2L)
    val pruned = VectorOps.probeIvfIndex(spark, path, two, k = 5, nprobe = 2)
    val scans = pruned.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("corpus")) => f
    }
    assert(scans.nonEmpty, "corpus scan not found in the probe plan")
    val selected = scans.head.selectedPartitions.partitionCount
    assert(selected >= 1 && selected <= 4,
      s"2 queries x nprobe=2 must select <=4 cell partitions, got $selected")
  }

  test("external queries on a clustered corpus: >=0.9 recall at 2 of 8 cells") {
    // queries are fresh perturbations of the planted centers — near the
    // clusters but never inserted — so the quantizer must route each to
    // its home cell without having seen it
    val rnd = new scala.util.Random(11L)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    val corpus = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = (0 until 16).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f).toSeq)
    }.toDF("qid", "embedding")
    val brute = topkSet(VectorOps.dotTopKWith(corpus, queries, k = 5))
    val got = topkSet(VectorOps.ivfSearch(corpus, queries, k = 5,
      nprobe = 2, cells = 8))
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.9,
      s"held-out queries must land in their home cells: recall $recall")
  }

  test("append path: stored-centroid assignment, exhaustive parity, recall kept, drift retrain") {
    val rnd = new scala.util.Random(13L)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    def mk(ids: Range): Seq[(Long, Seq[Float])] = ids.map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f).toSeq)
    }
    val initial = mk(0 until 320)
    val path = java.nio.file.Files.createTempDirectory("ivf_append").toString
    VectorOps.writeIvfIndex(initial.toDF("vec_id", "embedding"), path,
      cells = 8)
    // small append: 40/320 = 12.5% added mass, under the 50% threshold —
    // assigned to STORED centroids, appended into cell partitions only
    val extra = mk(1000 until 1040)
    val retrained = VectorOps.appendToIvfIndex(spark, path,
      extra.toDF("vec_id", "embedding"), retrainThreshold = 0.5,
      retrainCells = 8)
    assert(!retrained, "12.5% added mass must not trigger a retrain")
    val queries = mk(5000 until 5012)
      .map { case (id, v) => (id - 5000L, v) }.toDF("qid", "embedding")
    val all = (initial ++ extra).toDF("vec_id", "embedding")
    val brute = topkSet(VectorOps.dotTopKWith(all, queries, k = 5))
    // probing EVERY cell is exhaustive over old + new rows: append must
    // have placed each new vector somewhere a full probe can see
    val exhaustive = topkSet(VectorOps.probeIvfIndex(spark, path, queries,
      k = 5, nprobe = 8))
    assert(exhaustive == brute,
      "search-after-append at nprobe=cells must equal brute force")
    // cluster-structured appends land in their home cells, so low-nprobe
    // recall is preserved
    val low = topkSet(VectorOps.probeIvfIndex(spark, path, queries,
      k = 5, nprobe = 2))
    val recall = (brute & low).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall after append degraded: $recall")
    // big append: 340/320 > 50% added mass → drift-triggered retrain
    val big = mk(2000 until 2300)
    val retrained2 = VectorOps.appendToIvfIndex(spark, path,
      big.toDF("vec_id", "embedding"), retrainThreshold = 0.5,
      retrainCells = 8)
    assert(retrained2, "106% added mass must trigger a retrain")
    // the swapped-in retrained index is complete and consistent
    val all2 = (initial ++ extra ++ big).toDF("vec_id", "embedding")
    val brute2 = topkSet(VectorOps.dotTopKWith(all2, queries, k = 5))
    val ex2 = topkSet(VectorOps.probeIvfIndex(spark, path, queries,
      k = 5, nprobe = 8))
    assert(ex2 == brute2, "retrained index must still match brute force")
    // and the retrained centroid table reflects the full corpus mass
    val trained = spark.read
      .parquet(s"${VectorOps.indexGenDir(spark, path)}/centroids")
      .agg(sum($"cn")).head().getLong(0)
    assert(trained == 660L, s"retrained cn mass must be 660, got $trained")
  }

  test("append path: distribution shift below the mass threshold still retrains (qerr drift)") {
    val rnd = new scala.util.Random(17L)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    def mk(ids: Range, shift: Float = 0f): Seq[(Long, Seq[Float])] =
      ids.map { i =>
        val c = centers(i % 8)
        (i.toLong,
          c.map(x => x + shift + (rnd.nextFloat() - 0.5f) * 0.02f).toSeq)
      }
    val path = java.nio.file.Files.createTempDirectory("ivf_qerr").toString
    VectorOps.writeIvfIndex(mk(0 until 320).toDF("vec_id", "embedding"),
      path, cells = 8)
    // same-distribution small append: neither mass (12.5%) nor error
    // drift — the qerr signal must not fire on ordinary growth
    assert(!VectorOps.appendToIvfIndex(spark, path,
      mk(1000 until 1040).toDF("vec_id", "embedding"),
      retrainThreshold = 0.5, retrainCells = 8),
      "same-distribution append must not retrain")
    // NEW-REGION small append: every coordinate shifted +10 puts the
    // batch ~64·10² away from every centroid (trained mean error is the
    // ±0.01 perturbation scale) — mass is still 12.5%, but the
    // quantization-error ratio is astronomical → retrain
    assert(VectorOps.appendToIvfIndex(spark, path,
      mk(3000 until 3040, shift = 10f).toDF("vec_id", "embedding"),
      retrainThreshold = 0.5, retrainCells = 9),
      "a distribution-shifting append must trigger the qerr retrain")
    // the retrained quantizer now has a cell for the new region: the
    // shifted vectors quantize well again, and search stays exact at
    // nprobe=cells over the whole grown corpus
    val corpusNow = spark.read
      .parquet(s"${VectorOps.indexGenDir(spark, path)}/corpus")
      .select($"vec_id", $"embedding")
    val queries = mk(5000 until 5004, shift = 10f)
      .map { case (id, v) => (id - 5000L, v) }.toDF("qid", "embedding")
    def tk(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = tk(VectorOps.dotTopKWith(corpusNow, queries, k = 5))
    val ex = tk(VectorOps.probeIvfIndex(spark, path, queries, k = 5,
      nprobe = 9))
    assert(ex == brute, "post-qerr-retrain index must match brute force")
    // and a LOW-nprobe probe of shifted queries is now accurate too:
    // the new region got its own cell(s), so nprobe=2 finds the
    // shifted vectors (pre-retrain they shared cells with everything)
    val low = tk(VectorOps.probeIvfIndex(spark, path, queries, k = 5,
      nprobe = 2))
    val recall = (brute & low).size.toDouble / brute.size
    assert(recall >= 0.9, s"shifted-region recall after retrain: $recall")
  }

  test("delete path: tombstones hide rows exactly; compaction + threshold rewrite apply them physically") {
    val rnd = new scala.util.Random(19L)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    def mk(ids: Range): Seq[(Long, Seq[Float])] = ids.map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f).toSeq)
    }
    def tk(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val initial = mk(0 until 320)
    val path = java.nio.file.Files.createTempDirectory("ivf_del").toString
    VectorOps.writeIvfIndex(initial.toDF("vec_id", "embedding"), path,
      cells = 8)
    val queries = mk(5000 until 5012)
      .map { case (id, v) => (id - 5000L, v) }.toDF("qid", "embedding")
    // 30/320 = 9.4% tombstoned: logical-only delete, no rewrite
    val rewrote = VectorOps.deleteFromIvfIndex(spark, path,
      (0L until 30L).toSeq.toDF("vec_id"), rewriteThreshold = 0.2,
      retrainCells = 8)
    assert(!rewrote, "9.4% deletion must stay logical")
    assert(new java.io.File(
      s"${VectorOps.indexGenDir(spark, path)}/tombstones").exists())
    val live = initial.filterNot(_._1 < 30)
    val brute = tk(VectorOps.dotTopKWith(live.toDF("vec_id", "embedding"),
      queries, k = 5))
    val ex = tk(VectorOps.probeIvfIndex(spark, path, queries, k = 5,
      nprobe = 8))
    assert(ex == brute, "probe must serve exactly the live corpus")
    assert(ex.forall(_._2 >= 30L), "a tombstoned row surfaced in a probe")
    // re-using a tombstoned id before compaction fails LOUDLY (silently
    // accepting it would leave two physical rows after the next rewrite)
    val re5 = mk(5 until 6)
    val exn = intercept[IllegalArgumentException] {
      VectorOps.appendToIvfIndex(spark, path,
        re5.toDF("vec_id", "embedding"), retrainCells = 8)
    }
    assert(exn.getMessage.contains("compactIvfIndex"))
    // explicit compaction: tombstones applied physically and cleared —
    // the ledger dies with the superseded generation
    VectorOps.compactIvfIndex(spark, path, cells = 8)
    val gen2 = VectorOps.indexGenDir(spark, path)
    assert(!new java.io.File(s"$gen2/tombstones").exists())
    assert(spark.read.parquet(s"$gen2/corpus").count() == 290L)
    assert(tk(VectorOps.probeIvfIndex(spark, path, queries, k = 5,
      nprobe = 8)) == brute, "compaction changed the served relation")
    // the freed id is appendable now
    assert(!VectorOps.appendToIvfIndex(spark, path,
      re5.toDF("vec_id", "embedding"), retrainCells = 8))
    val live2 = live ++ re5
    assert(tk(VectorOps.probeIvfIndex(spark, path, queries, k = 5,
        nprobe = 8)) ==
      tk(VectorOps.dotTopKWith(live2.toDF("vec_id", "embedding"),
        queries, k = 5)))
    // 80/290 = 27.6% tombstoned: crosses the threshold → auto-rewrite
    val rewrote2 = VectorOps.deleteFromIvfIndex(spark, path,
      (100L until 180L).toSeq.toDF("vec_id"), rewriteThreshold = 0.2,
      retrainCells = 8)
    assert(rewrote2, "27.6% deletion must trigger the physical rewrite")
    val gen3 = VectorOps.indexGenDir(spark, path)
    assert(!new java.io.File(s"$gen3/tombstones").exists())
    assert(spark.read.parquet(s"$gen3/corpus").count() == 211L)
    val live3 = live2.filterNot(r => r._1 >= 100L && r._1 < 180L)
    assert(tk(VectorOps.probeIvfIndex(spark, path, queries, k = 5,
        nprobe = 8)) ==
      tk(VectorOps.dotTopKWith(live3.toDF("vec_id", "embedding"),
        queries, k = 5)))
  }

  test("delete guards: all-dead refuses before the ledger; absent ids no-op") {
    // the round-16 Hnsw parity pass: (a) a batch that would tombstone
    // every physical row refuses BEFORE any write — the old order left
    // a published index whose probes silently served zero rows below
    // the threshold; (b) a typo'd delete of a never-indexed id used to
    // enter the ledger and block that id's future append until a FULL
    // RETRAIN — the ledger now holds only physically-present ids
    val rnd = new scala.util.Random(23L)
    val rows = (0 until 40).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2f - 1f).toSeq)
    }
    val path = java.nio.file.Files.createTempDirectory("ivf_guard").toString
    VectorOps.writeIvfIndex(rows.toDF("vec_id", "embedding"), path,
      cells = 4)
    val genDir = VectorOps.indexGenDir(spark, path)
    // (b) absent id: no ledger, and the id appends cleanly afterwards
    assert(!VectorOps.deleteFromIvfIndex(spark, path,
      Seq(9999L).toDF("vec_id"), rewriteThreshold = 0.01))
    assert(!new java.io.File(s"$genDir/tombstones").exists(),
      "an absent id entered the ledger")
    assert(!VectorOps.appendToIvfIndex(spark, path,
      Seq((9999L, rows.head._2)).toDF("vec_id", "embedding")))
    // (a) deleting every row (plus strays) refuses loudly, pre-ledger
    // ids 0..49 cover the 40 built rows (40..49 are strays the
    // presence filter drops); 9999 covers the appended row → all 41
    // physical rows dead
    val e = intercept[IllegalStateException](
      VectorOps.deleteFromIvfIndex(spark, path,
        (0L until 50L).toSeq.toDF("vec_id")
          .union(Seq(9999L).toDF("vec_id")),
        rewriteThreshold = 0.2))
    assert(e.getMessage.contains("every row"), e.getMessage)
    val gen2 = VectorOps.indexGenDir(spark, path)
    assert(!new java.io.File(s"$gen2/tombstones").exists(),
      "the refused delete leaked a ledger")
    // probes still serve the full store
    val q = Seq((0L, rows.head._2)).toDF("qid", "embedding")
    assert(VectorOps.probeIvfIndex(spark, path, q, k = 3, nprobe = 4)
      .count() == 3)
    // (a') hand-torn full-coverage ledger: the retrain refuses loudly
    spark.read.parquet(s"$gen2/corpus").select(col("vec_id"))
      .write.mode("overwrite").parquet(s"$gen2/tombstones")
    val e2 = intercept[IllegalStateException](
      VectorOps.compactIvfIndex(spark, path, cells = 4))
    assert(e2.getMessage.contains("empty index"), e2.getMessage)
  }

  test("generation layout: partial builds never serve, torn swaps fail loudly") {
    val path = java.nio.file.Files.createTempDirectory("ivf_gen").toString
    val corpus = graft.sources.Tables.embeddings(spark, sf)
    VectorOps.writeIvfIndex(corpus, path, cells = 8)
    val gen0 = VectorOps.indexGenDir(spark, path)
    val before = VectorOps.probeIvfIndex(spark, path, nprobe = 2).collect().toSeq
    // simulated crash mid-rebuild: an UNREFERENCED partial generation
    // appears on disk — the pointer still names gen=0, probes unchanged
    assert(new java.io.File(s"$path/gen=99").mkdirs())
    assert(VectorOps.indexGenDir(spark, path) == gen0)
    assert(VectorOps.probeIvfIndex(spark, path, nprobe = 2).collect().toSeq
      == before, "a partial unpublished generation changed probe results")
    // the next successful build skips the partial gen's number (max+1 —
    // never reuses a possibly-dirty dir) and garbage-collects it
    // IMMEDIATELY (a partial was never current: no reader can hold it) —
    // while the SUPERSEDED generation survives one publish cycle, the
    // grace a multi-reader deployment needs for probes that resolved
    // the pointer just before the flip
    VectorOps.writeIvfIndex(corpus, path, cells = 8)
    val gen1 = VectorOps.indexGenDir(spark, path)
    assert(gen1.endsWith("gen=100"), s"expected gen=100, got $gen1")
    assert(!new java.io.File(s"$path/gen=99").exists(),
      "publish must retire unreferenced partial generations")
    assert(new java.io.File(gen0).exists(),
      "the superseded generation must get a one-cycle deletion grace")
    // an in-flight reader that resolved gen0 pre-flip still reads it
    assert(spark.read.parquet(s"$gen0/corpus").count() > 0L)
    // the NEXT publish ends gen0's grace: only {current, previous} live
    VectorOps.writeIvfIndex(corpus, path, cells = 8)
    val gen2 = VectorOps.indexGenDir(spark, path)
    assert(gen2.endsWith("gen=101"), s"expected gen=101, got $gen2")
    assert(!new java.io.File(gen0).exists(),
      "grace must end at the following publish")
    assert(new java.io.File(gen1).exists())
    // explicit expiry once readers have drained: only the current stays
    assert(VectorOps.expireIvfGenerations(spark, path) == 1)
    assert(!new java.io.File(gen1).exists())
    assert(VectorOps.probeIvfIndex(spark, path, nprobe = 2).collect()
      .toSeq == before, "expiry changed the served relation")
    // torn generation (pointer names a dir whose manifest never landed):
    // serving it would silently mix quantizers — must throw instead
    assert(new java.io.File(s"$gen2/_GRAFT_INDEX_OK").delete())
    val ex = intercept[IllegalStateException] {
      VectorOps.probeIvfIndex(spark, path, nprobe = 2).collect()
    }
    assert(ex.getMessage.contains("torn"), s"wrong error: ${ex.getMessage}")
  }

  test("qerr drift: a 2% shifted sub-batch inside a conforming append still retrains") {
    // the dilution hole the whole-batch-mean signal had: 196 conforming
    // vectors + 4 moderately-shifted ones (per-vector error ratio ≈ 50,
    // not astronomical) pull the batch MEAN ratio well under errFactor,
    // but the over-factor FRACTION (4/200 = 2%) fires the retrain — a
    // new data source sneaking into a corpus looks exactly like this
    val rnd = new scala.util.Random(23L)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    def mk(ids: Range, shift: Float = 0f): Seq[(Long, Seq[Float])] =
      ids.map { i =>
        val c = centers(i % 8)
        (i.toLong,
          c.map(x => x + shift + (rnd.nextFloat() - 0.5f) * 0.02f).toSeq)
      }
    val path = java.nio.file.Files.createTempDirectory("ivf_dilut").toString
    VectorOps.writeIvfIndex(mk(0 until 320).toDF("vec_id", "embedding"),
      path, cells = 8)
    // conforming-only append: neither signal fires (ratio tails sit ~27σ
    // under the factor on this noise scale)
    val conforming = mk(1000 until 1196).toDF("vec_id", "embedding")
    val (mc, fc) = VectorOps.driftStats(spark, path, conforming)
    assert(mc < 4.0 && fc == 0.0, s"conforming batch scored mean=$mc frac=$fc")
    assert(!VectorOps.appendToIvfIndex(spark, path, conforming,
      retrainThreshold = 10.0, retrainCells = 8),
      "conforming append must not retrain")
    // mixed append: shift +0.04/coordinate ⇒ per-vector ratio ≈ 64·0.04²
    // / (64·0.02²/12) ≈ 48 — over the factor individually, but diluted
    // to ≈ 1.9 in the batch mean. The stats prove this batch exercises
    // the FRACTION trigger specifically (mean alone would miss it).
    val mixed = (mk(2000 until 2196) ++ mk(3000 until 3004, shift = 0.04f))
      .toDF("vec_id", "embedding")
    val (mm, fm) = VectorOps.driftStats(spark, path, mixed)
    assert(mm < 4.0, s"calibration broken: batch mean ratio $mm not diluted")
    assert(fm >= 0.02, s"calibration broken: over-factor fraction $fm < 2%")
    assert(VectorOps.appendToIvfIndex(spark, path, mixed,
      retrainThreshold = 10.0, retrainCells = 9),
      "a diluted 2% shifted sub-batch must still trigger the qerr retrain")
  }

  test("ivfKnnJoin: exhaustive at nprobe=cells, cell-bounded and accurate below") {
    val rnd = new scala.util.Random(29L)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    val rows = (0 until 200).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f).toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    // probing every cell IS the exact k-NN self-join: bit-identical to
    // brute force (fused integer dot ≡ decimal expression dot)
    val brute = VectorOps.dotTopKFrom(corpus, nQueries = 200, k = 3)
      .collect().toSeq
    val full = VectorOps.ivfKnnJoin(corpus, k = 3, nprobe = 8, cells = 8)
      .collect().toSeq
    assert(full == brute, "nprobe=cells k-NN join must equal brute force")
    // partial probe: every query still gets k neighbors, and on
    // clustered data 2 of 8 cells keep ≥0.9 of the true neighbors
    val part = VectorOps.ivfKnnJoin(corpus, k = 3, nprobe = 2, cells = 8)
    val counts = part.groupBy($"qid").count().collect()
    assert(counts.length == 200 && counts.forall(_.getLong(1) == 3L))
    val bSet = topkSet(VectorOps.dotTopKFrom(corpus, nQueries = 200, k = 3))
    val recall = (bSet & topkSet(part)).size.toDouble / bSet.size
    assert(recall >= 0.9, s"clustered k-NN join recall $recall")
    // plan shape: the candidate join is an EQUIJOIN on the cell id (hash
    // or sort-merge) — a cartesian here would be the all-pairs scale
    // killer. (The one-row broadcast centroid-array attach is a bounded
    // nested-loop by construction and is fine.)
    val plan = part.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"k-NN join planned as a cartesian product:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"k-NN candidate join is not an equijoin on cell:\n$plan")
  }

  test("q110 semantic dedup: planted copies die with their source as witness") {
    val sources = graft.sources.Tables.embeddings(spark, sf)
      .filter($"vec_id" % 10 === 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val dropped = VectorOps.semanticDedup(spark, sf).collect()
    assert(dropped.nonEmpty)
    // keep-first: an original row can never be dropped — its only
    // >=0.99-cosine neighbor is its copy, whose id is LARGER
    dropped.foreach { r =>
      val (id, dupOf) = (r.getLong(0), r.getLong(1))
      assert(id >= 1000000L, s"non-planted row $id dropped")
      assert(dupOf == id - 1000000L,
        s"copy $id blamed witness $dupOf, not its source")
    }
    // recall: a copy shares its source's cell (identical vector ⇒
    // identical assignment AND identical probe ranking), so the k-NN
    // join finds the source for essentially every copy
    val rate = dropped.length.toDouble / sources.size
    assert(rate >= 0.9, s"only ${dropped.length}/${sources.size} copies dropped")
  }

  test("q113 semantic clusters: copy pairs collapse to the source label, others singleton") {
    val r = VectorOps.semanticClusters(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    assert(r.nonEmpty)
    val relabeled = r.filter { case (id, c) => c != id }
    // only copies can be relabeled (no random pair clears cos >= 0.99),
    // and a relabeled copy's component minimum is its source
    relabeled.foreach { case (id, c) =>
      assert(id >= 1000000L && c == id - 1000000L,
        s"row $id landed in cluster $c")
    }
    val nPlanted = r.count(_._1 >= 1000000L)
    assert(relabeled.length >= (0.9 * nPlanted).toInt,
      s"only ${relabeled.length}/$nPlanted copies clustered with their source")
  }

  test("recall on a clustered corpus: >=0.9 probing 2 of 8 cells") {
    // 8 planted clusters: deterministic centers, small perturbations —
    // the shape a trained quantizer exists for. 64-dim, 400 vectors.
    val rnd = new scala.util.Random(7L)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    val rows = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f).toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val exact = topkSet(VectorOps.dotTopKFrom(corpus))
    val got = topkSet(VectorOps.ivfTopKFrom(corpus, nprobe = 2, cells = 8))
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.9,
      s"trained quantizer must exploit cluster structure: recall $recall")
  }

  test("meta count: maintenance decisions are metadata-only (stamped sentinel)") {
    // Round-17 parity with the Hnsw meta count (round-16 VERDICT missing
    // #1): the OK sentinel carries the generation's exact physical row
    // count, so delete's rewrite threshold and append's mass-drift check
    // stop paying an O(corpus-footers) count() per maintenance batch.
    // The forged-stamp leg PROVES the decision reads the sentinel (a
    // footer count would see the true total and rewrite); the
    // empty-sentinel leg covers pre-round-17 generations (one fallback
    // footer count, stamped back).
    val rnd = new scala.util.Random(41L)
    def mk(ids: Range): Seq[(Long, Seq[Float])] = ids.map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2f - 1f).toSeq)
    }
    val path = java.nio.file.Files.createTempDirectory("ivf_meta").toString
    VectorOps.writeIvfIndex(mk(0 until 40).toDF("vec_id", "embedding"),
      path, cells = 4)
    def stamp(): String = {
      val f = new java.io.File(
        s"${VectorOps.indexGenDir(spark, path)}/_GRAFT_INDEX_OK")
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.mkString.trim finally src.close()
    }
    assert(stamp() == "40", "build must stamp the exact written row count")
    // append: exact arithmetic (old + batch), restamped in place
    assert(!VectorOps.appendToIvfIndex(spark, path,
      mk(40 until 50).toDF("vec_id", "embedding"), retrainCells = 4))
    assert(stamp() == "50", "append must restamp old + batch")
    // FORGE the stamp high: 15/50 = 30% would cross the 20% threshold,
    // but against the forged 5000 it reads as 0.3% — no rewrite proves
    // the threshold consumed the sentinel, never a corpus footer count
    val genDir = VectorOps.indexGenDir(spark, path)
    // forge through the Hadoop FS so the .crc sidecar follows
    def forge(body: String): Unit = {
      val sp = new org.apache.hadoop.fs.Path(s"$genDir/_GRAFT_INDEX_OK")
      val hfs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = hfs.create(sp, true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    }
    forge("5000")
    assert(!VectorOps.deleteFromIvfIndex(spark, path,
      (0L until 15L).toSeq.toDF("vec_id"), rewriteThreshold = 0.2,
      retrainCells = 4),
      "threshold decision must be metadata-only (read the forged stamp)")
    // LEGACY sentinel (pre-round-17: empty file): one footer-count
    // fallback, honest decision, and the result is stamped back; the
    // 15 existing + 5 novel tombstones now cross 20/50 = 40% → rewrite,
    // and the retrained generation stamps its own fresh count
    forge("")
    assert(VectorOps.deleteFromIvfIndex(spark, path,
      (15L until 20L).toSeq.toDF("vec_id"), rewriteThreshold = 0.2,
      retrainCells = 4),
      "legacy (empty) sentinel must fall back to one footer count")
    assert(stamp() == "30",
      "retrained generation must stamp its live row count")
    assert(spark.read.parquet(
      s"${VectorOps.indexGenDir(spark, path)}/corpus").count() == 30L)
  }
}
