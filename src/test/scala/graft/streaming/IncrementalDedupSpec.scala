package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpecBase
import graft.operators.TextOps

class IncrementalDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def docsDF(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def labelsMap(dir: String): Map[Long, Long] =
    IncrementalDedup.currentLabels(spark, dir).get.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def truth(rows: Seq[(Long, String)]): Map[Long, Long] =
    TextOps.clusterAssignments(docsDF(rows)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incremental == batch recompute after every batch (real corpus, cross-batch dups)") {
    val base = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val n = base.length
    assert(n > 30, "corpus too small to split")
    val (b1, rest) = base.splitAt(n / 3)
    val (b2, b3raw) = rest.splitAt(n / 3)
    // plant cross-batch duplicates: every 5th doc of batch 1 reappears in
    // batch 3 under a new id — the incremental path must link it to the
    // batch-1 cluster through the stored bucket index
    val planted = b1.zipWithIndex.collect {
      case ((id, t), i) if i % 5 == 0 => (id + 1000000L, t)
    }
    val b3 = b3raw ++ planted
    val dir = Files.createTempDirectory("inc_dedup").toString
    var seen = Seq.empty[(Long, String)]
    Seq(b1, b2, b3).zipWithIndex.foreach { case (batch, i) =>
      IncrementalDedup.mergeBatch(docsDF(batch), i.toLong, dir)
      seen = seen ++ batch
      assert(labelsMap(dir) == truth(seen), s"divergence after batch $i")
    }
    // the planted dups really landed in their originals' clusters
    val fin = labelsMap(dir)
    planted.foreach { case (pid, _) =>
      val orig = pid - 1000000L
      assert(fin(pid) == fin(orig), s"planted $pid not clustered with $orig")
    }
  }

  test("a later smaller-id duplicate relabels the stored cluster") {
    val dir = Files.createTempDirectory("inc_relabel").toString
    IncrementalDedup.mergeBatch(docsDF(Seq(
      (50L, "x y z w v u t s"),
      (60L, "completely different words appear here now"))), 0L, dir)
    assert(labelsMap(dir) == Map(50L -> 50L, 60L -> 60L))
    // id 7 < 50 carries the same text: the stored cluster's label must
    // DECREASE to 7 — the affected-member relabel path
    IncrementalDedup.mergeBatch(docsDF(Seq(
      (7L, "x y z w v u t s"))), 1L, dir)
    assert(labelsMap(dir) == Map(50L -> 7L, 7L -> 7L, 60L -> 60L))
  }

  test("replay of the latest batch is idempotent") {
    val dir = Files.createTempDirectory("inc_replay").toString
    val b0 = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa"))
    val b1 = Seq((3L, "alpha beta gamma delta epsilon"))
    IncrementalDedup.mergeBatch(docsDF(b0), 0L, dir)
    IncrementalDedup.mergeBatch(docsDF(b1), 1L, dir)
    val after = labelsMap(dir)
    assert(after(3L) == after(1L), "identical text must share a cluster")
    IncrementalDedup.mergeBatch(docsDF(b1), 1L, dir) // crash-and-replay
    assert(labelsMap(dir) == after, "replay must not change the state")
  }

  test("short docs without a signature label themselves") {
    val dir = Files.createTempDirectory("inc_short").toString
    IncrementalDedup.mergeBatch(docsDF(Seq(
      (10L, "hi"), (11L, "alpha beta gamma delta"))), 0L, dir)
    val m = labelsMap(dir)
    assert(m(10L) == 10L && m(11L) == 11L)
  }

  // ---- deletion/retraction support ----

  private def opsDF(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "text", "op")

  /** 13 docs on an alpha→bravo vocabulary gradient: doc p = p alpha-words
    * then 12-p bravo-words. Empirically (pinned by the first assertion)
    * their 4×2 minhash band graph is one component where doc 8 is a CUT
    * VERTEX — its removal disconnects {9..12} from {0,1,3,4,5,6}. */
  private def gradientDocs: Seq[(Long, String)] = {
    val vocabA = (0 until 12).map(i => s"alpha$i")
    val vocabB = (0 until 12).map(i => s"bravo$i")
    (0 to 12).map(p =>
      (p.toLong, (vocabA.take(p) ++ vocabB.take(12 - p)).mkString(" ")))
  }

  test("deleting a bridge doc splits the stored cluster (matches recompute)") {
    val dir = Files.createTempDirectory("inc_split").toString
    val docs = gradientDocs
    IncrementalDedup.mergeBatch(
      opsDF(docs.map { case (id, t) => (id, t, "add") }), 0L, dir)
    val before = labelsMap(dir)
    assert(before == truth(docs), "append batch must match recompute")
    // pin the fixture's shape: 8 bridges the two sides pre-deletion
    assert(before(9L) == before(0L) && before(12L) == before(4L),
      s"fixture drifted — expected one component across the gradient: $before")
    IncrementalDedup.mergeBatch(opsDF(Seq((8L, "", "del"))), 1L, dir)
    val survivors = docs.filterNot(_._1 == 8L)
    val after = labelsMap(dir)
    assert(after == truth(survivors),
      "post-deletion labels must match the recompute on the surviving corpus")
    assert(!after.contains(8L), "deleted doc must leave the assignment")
    assert(after(9L) != after(0L),
      s"deleting the bridge must SPLIT the component: $after")
  }

  test("deleting the component minimum relabels the survivors") {
    val dir = Files.createTempDirectory("inc_delmin").toString
    IncrementalDedup.mergeBatch(opsDF(Seq(
      (1L, "p q r s t u v w", "add"),
      (5L, "p q r s t u v w", "add"),
      (9L, "far away unrelated words entirely", "add"))), 0L, dir)
    assert(labelsMap(dir) == Map(1L -> 1L, 5L -> 1L, 9L -> 9L))
    // delete the label-carrying doc AND a doc_id that never existed
    IncrementalDedup.mergeBatch(opsDF(Seq(
      (1L, "", "del"), (12345L, "", "del"))), 1L, dir)
    assert(labelsMap(dir) == Map(5L -> 5L, 9L -> 9L),
      "survivor must take over as its own label; unknown deletes are no-ops")
  }

  test("interleaved appends and deletes match the recompute after every batch") {
    val base = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val n = base.length
    val (b1, rest) = base.splitAt(n / 3)
    val (b2, b3) = rest.splitAt(n / 3)
    // batch 1: adds; batch 2: adds + delete every 7th of b1;
    // batch 3: adds + delete every 5th of b2 + REINSTATE (same text, new
    // id) two docs deleted in batch 2 — they must rejoin their clusters
    val del1 = b1.zipWithIndex.collect { case ((id, _), i) if i % 7 == 0 => id }
    val del2 = b2.zipWithIndex.collect { case ((id, _), i) if i % 5 == 0 => id }
    val reinstated = b1.filter(d => del1.take(2).contains(d._1))
      .map { case (id, t) => (id + 2000000L, t) }
    val batches: Seq[Seq[(Long, String, String)]] = Seq(
      b1.map { case (id, t) => (id, t, "add") },
      b2.map { case (id, t) => (id, t, "add") } ++
        del1.map(id => (id, "", "del")),
      (b3 ++ reinstated).map { case (id, t) => (id, t, "add") } ++
        del2.map(id => (id, "", "del")))
    val dir = Files.createTempDirectory("inc_mixed").toString
    var live = Map.empty[Long, String]
    batches.zipWithIndex.foreach { case (batch, i) =>
      IncrementalDedup.mergeBatch(opsDF(batch), i.toLong, dir)
      val dels = batch.collect { case (id, _, "del") => id }.toSet
      live = (live -- dels) ++
        batch.collect { case (id, t, "add") => id -> t }.toMap
      assert(labelsMap(dir) == truth(live.toSeq), s"divergence after batch $i")
    }
  }

  // ---- delta publishing / compaction ----

  private def versionDirs(dir: String, kind: String): Seq[String] = {
    val d = new java.io.File(s"$dir/$kind")
    if (!d.exists()) Seq.empty
    else d.listFiles().map(_.getName).filter(_.startsWith("v=")).sorted.toSeq
  }

  private def isFull(dir: String, kind: String, v: String): Boolean =
    new java.io.File(s"$dir/$kind/$v/_FULL").exists()

  test("delta publishing: non-compaction batches write O(batch) rows, not the corpus") {
    val dir = Files.createTempDirectory("inc_delta").toString
    val bulk = (0L until 300L).map(i => (i, s"document number $i with words w${i % 40} x y z"))
    IncrementalDedup.mergeBatch(docsDF(bulk), 0L, dir) // first batch → FULL
    assert(isFull(dir, "labels", "v=0"), "first batch must be a full snapshot")
    // small append → delta version containing only the batch's rows
    IncrementalDedup.mergeBatch(docsDF(Seq(
      (9001L, "document number 9001 with words w1 x y z"))), 1L, dir)
    assert(!isFull(dir, "labels", "v=1"), "small batch must publish a delta")
    val deltaRows = spark.read.parquet(s"$dir/labels/v=1").count()
    assert(deltaRows < 50,
      s"label delta should be O(batch+affected), got $deltaRows rows")
    // the folded view is still the whole corpus
    assert(labelsMap(dir).size == 301)
    assert(labelsMap(dir) == truth(bulk :+
      (9001L, "document number 9001 with words w1 x y z")))
  }

  test("compaction: a full snapshot lands every compactEvery deltas and GC bounds the chain") {
    val dir = Files.createTempDirectory("inc_compact").toString
    var live = Seq.empty[(Long, String)]
    (0 until 9).foreach { i =>
      val batch = Seq((i.toLong, s"doc $i words a$i b$i c d e"))
      live = live ++ batch
      IncrementalDedup.mergeBatch(docsDF(batch), i.toLong, dir,
        compactEvery = 3)
      assert(labelsMap(dir) == truth(live), s"divergence after batch $i")
    }
    val vs = versionDirs(dir, "labels")
    val fulls = vs.filter(v => isFull(dir, "labels", v))
    assert(fulls.length >= 2, s"expected periodic fulls, got $vs -> $fulls")
    // GC keeps the two newest fulls and the deltas after the older one
    assert(vs.length <= 8, s"GC failed to bound the version chain: $vs")
    // and the fold across fulls+deltas still reconstructs the corpus
    assert(labelsMap(dir) == truth(live))
  }

  test("replay of a compaction batch is idempotent") {
    val dir = Files.createTempDirectory("inc_compact_replay").toString
    (0 until 4).foreach { i =>
      IncrementalDedup.mergeBatch(docsDF(Seq(
        (i.toLong, s"doc $i words a$i b c d"))), i.toLong, dir,
        compactEvery = 3)
    }
    val before = labelsMap(dir)
    val fullsBefore = versionDirs(dir, "labels")
      .filter(v => isFull(dir, "labels", v))
    // batch 3 compacted (3 versions preceded it); crash-and-replay it
    IncrementalDedup.mergeBatch(docsDF(Seq(
      (3L, "doc 3 words a3 b c d"))), 3L, dir, compactEvery = 3)
    assert(labelsMap(dir) == before, "replay must not change the state")
    assert(versionDirs(dir, "labels").filter(v => isFull(dir, "labels", v))
      == fullsBefore, "replay must make the same full-vs-delta choice")
  }

  test("re-ingesting a live id with new text retracts its old band keys") {
    // the stale-bands trap: {3,7,9} share text A; doc 3 is then UPDATED
    // to unrelated text B; deleting 7 afterwards must NOT reconnect 3 and
    // 9 through 3's retracted A-keys — 9 ends up alone, 3 alone
    val dir = Files.createTempDirectory("inc_reingest").toString
    val textA = "shared alpha beta gamma delta epsilon zeta"
    val textB = "entirely different words live in this doc now"
    IncrementalDedup.mergeBatch(docsDF(Seq(
      (3L, textA), (7L, textA), (9L, textA))), 0L, dir)
    assert(labelsMap(dir) == Map(3L -> 3L, 7L -> 3L, 9L -> 3L))
    IncrementalDedup.mergeBatch(docsDF(Seq((3L, textB))), 1L, dir)
    assert(labelsMap(dir) == truth(Seq((3L, textB), (7L, textA), (9L, textA))),
      "update must re-cluster doc 3 by its NEW text")
    IncrementalDedup.mergeBatch(opsDF(Seq((7L, "", "del"))), 2L, dir)
    val after = labelsMap(dir)
    assert(after == truth(Seq((3L, textB), (9L, textA))),
      s"stale bands reconnected the split component: $after")
    assert(after(3L) != after(9L), "3 and 9 share no current text")
  }

  test("property: random add/delete sequences match the recompute after every batch") {
    // Seeded-random op streams over a small text pool (8 distinct texts
    // across 30 doc ids forces real shared clusters, merges, AND splits),
    // checked against TextOps.clusterAssignments after every batch — the
    // generalized form of the handwritten bridge/min-deletion cases.
    val texts = (0 until 8).map(t =>
      s"pool text $t with words w$t x$t y z shared tokens")
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(1000L + seed)
      val dir = Files.createTempDirectory(s"inc_prop_$seed").toString
      var live = Map.empty[Long, String]
      (0 until 4).foreach { batchId =>
        // adds may hit LIVE ids (text updates — retract-then-add path);
        // contract is only one op per doc_id per batch (distinctBy)
        val adds = (0 until 6).map { _ =>
          val id = rnd.nextInt(30).toLong
          (id, texts(rnd.nextInt(texts.length)), "add")
        }.distinctBy(_._1)
        val dels = if (live.isEmpty) Seq.empty
          else rnd.shuffle(live.keys.toSeq).take(rnd.nextInt(3))
            .map(id => (id, "", "del"))
        val batch = (dels ++ adds).distinctBy(_._1)
        if (batch.nonEmpty) {
          IncrementalDedup.mergeBatch(opsDF(batch), batchId.toLong, dir,
            compactEvery = 3)
          live = (live -- dels.map(_._1)) ++
            adds.map { case (id, t, _) => id -> t }.toMap
          assert(labelsMap(dir) == truth(live.toSeq),
            s"seed $seed diverged after batch $batchId")
        }
      }
    }
  }

  // ---- crash-replay: a partial publish must not corrupt the replay ----

  private def deleteVersion(dir: String, kind: String, v: Long): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(s"$dir/$kind/v=$v"))
  }

  test("replay of a crashed members-migration batch re-derives the index, not empty") {
    // round-7-style dir: labels+buckets only. The migration batch derives
    // the members table from labels; a crash AFTER publish("members") but
    // before the later publishes leaves members/v=N on disk while the
    // checkpoint never committed. The replay must re-derive members from
    // labels again — its own crashed v=N folds to nothing and taking the
    // "table exists" read branch on it would gut the index corpus-wide.
    val dir = Files.createTempDirectory("inc_replay_mig").toString
    val text = "replay alpha beta gamma delta epsilon zeta"
    val legacy = Seq((10L, text), (20L, text), (30L, "solo words one two three four"))
    writeLegacyState(dir, legacy)
    val batch = Seq((40L, text))
    IncrementalDedup.mergeBatch(docsDF(batch), 1L, dir)
    // crash window: labels+members v=1 published, buckets+bands v=1 not
    deleteVersion(dir, "buckets", 1L)
    deleteVersion(dir, "bands", 1L)
    IncrementalDedup.mergeBatch(docsDF(batch), 1L, dir) // the replay
    val all = legacy ++ batch
    assert(labelsMap(dir) == truth(all))
    assert(membersInverse(dir) == labelsMap(dir),
      "replayed migration must re-derive members from labels")
    // and the state keeps working: a later append still folds correctly
    IncrementalDedup.mergeBatch(docsDF(Seq((50L, text))), 2L, dir)
    val all2 = all :+ (50L, text)
    assert(labelsMap(dir) == truth(all2))
    assert(membersInverse(dir) == labelsMap(dir))
  }

  test("replay of a crashed FIRST batch must not brand a modern dir legacy") {
    // fresh dir, batch 0 crashes between publish("labels") and
    // publish("bands"): the replay sees labels-without-bands, which is
    // exactly what a legacy dir looks like — but only versions from
    // EARLIER batches are evidence, so no _LEGACY_BANDS marker may
    // appear and deletions must keep working afterwards
    val dir = Files.createTempDirectory("inc_replay_first").toString
    val text = "first alpha beta gamma delta epsilon zeta"
    val batch = Seq((1L, text), (2L, text), (3L, "other words a b c d"))
    IncrementalDedup.mergeBatch(docsDF(batch), 0L, dir)
    deleteVersion(dir, "members", 0L)
    deleteVersion(dir, "buckets", 0L)
    deleteVersion(dir, "bands", 0L)
    IncrementalDedup.mergeBatch(docsDF(batch), 0L, dir) // the replay
    assert(!new java.io.File(s"$dir/_LEGACY_BANDS").exists(),
      "transient crash must not permanently brand the dir legacy")
    assert(labelsMap(dir) == truth(batch))
    // deletions stay available (a legacy-branded dir would throw here)
    IncrementalDedup.mergeBatch(
      opsDF(Seq((2L, "", "del"))), 1L, dir)
    val after = batch.filterNot(_._1 == 2L)
    assert(labelsMap(dir) == truth(after))
    assert(membersInverse(dir) == labelsMap(dir))
  }

  test("ownership: a fresh checkpoint cannot silently adopt an existing state dir") {
    // a new stream's batch ids restart at 0; folding a populated dir with
    // upTo=0 would hide the corpus and then clobber it — the guard must
    // throw instead, naming the adoption rule
    val dir = Files.createTempDirectory("inc_owner").toString
    val text = "owner alpha beta gamma delta epsilon zeta"
    IncrementalDedup.mergeBatch(docsDF(Seq((1L, text), (2L, text))), 5L, dir)
    val e = intercept[IllegalStateException] {
      IncrementalDedup.mergeBatch(docsDF(Seq((3L, text))), 0L, dir)
    }
    assert(e.getMessage.contains("does not own"))
    assert(labelsMap(dir) == truth(Seq((1L, text), (2L, text))),
      "the guarded dir must be untouched")
    // the batchId-0 collision flavor: a legacy dir whose newest version
    // id EQUALS the adopting stream's first batch id
    val legacyDir = Files.createTempDirectory("inc_owner_legacy").toString
    writeLegacyState(legacyDir, Seq((10L, text), (20L, text))) // v=0
    val e2 = intercept[IllegalStateException] {
      IncrementalDedup.mergeBatch(docsDF(Seq((30L, text))), 0L, legacyDir)
    }
    assert(e2.getMessage.contains("legacy"))
    // the documented adoption path — ids above the newest version — works
    IncrementalDedup.mergeBatch(docsDF(Seq((30L, text))), 1L, legacyDir)
    assert(labelsMap(legacyDir) ==
      truth(Seq((10L, text), (20L, text), (30L, text))))
  }

  // ---- bucketed state layout: read-side pruning + the members index ----

  private def membersInverse(dir: String): Map[Long, Long] =
    IncrementalDedup.currentMembers(spark, dir).get.collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap

  test("members index stays the exact inverse of labels through adds, dels, compaction") {
    val dir = Files.createTempDirectory("inc_members").toString
    val textPool = (0 until 5).map(t => s"pool text $t words w$t x y z q")
    val batches: Seq[Seq[(Long, String, String)]] = Seq(
      (0L until 12L).map(i => (i, textPool((i % 5).toInt), "add")),
      Seq((12L, textPool(0), "add"), (3L, "", "del"), (7L, "", "del")),
      Seq((1L, textPool(4), "add"), (13L, textPool(2), "add")), // live update
      Seq((0L, "", "del")), // delete a label-carrying minimum
      Seq((14L, textPool(1), "add"))) // post-compaction append
    batches.zipWithIndex.foreach { case (batch, i) =>
      IncrementalDedup.mergeBatch(opsDF(batch), i.toLong, dir,
        compactEvery = 3)
      assert(membersInverse(dir) == labelsMap(dir),
        s"members index diverged from labels after batch $i")
    }
  }

  private def fileBytesRead(): Long = {
    val s = org.apache.hadoop.fs.GlobalStorageStatistics.INSTANCE.get("file")
    if (s == null) 0L
    else Option(s.getLong("bytesRead")).map(_.longValue()).getOrElse(0L)
  }

  private def dirBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(path))
  }

  test("bucketed layout: a small batch reads O(touched buckets), not the corpus") {
    val dir = Files.createTempDirectory("inc_pruned").toString
    // 2400 mostly-unique docs → full snapshots at v=0, partitioned by _b
    val bulk = (0L until 2400L).map(i =>
      (i, s"document $i unique words a$i b$i c$i d e f g h"))
    IncrementalDedup.mergeBatch(docsDF(bulk), 0L, dir)
    val bucketDirs = new java.io.File(s"$dir/labels/v=0").listFiles()
      .count(_.getName.startsWith("_b="))
    assert(bucketDirs > 16,
      s"full snapshot must be laid out in _b buckets, got $bucketDirs dirs")
    val stateBytes = dirBytes(dir)
    // one new doc: every state lookup is bucket-pruned, so the merge must
    // read a small fraction of the stored state (measured ~10-15%; the
    // bound leaves headroom for footer reads and listing overhead)
    val before = fileBytesRead()
    IncrementalDedup.mergeBatch(docsDF(Seq(
      (900001L, "document 900001 unique words a900001 b900001 c x y z"))),
      1L, dir)
    val readBytes = fileBytesRead() - before
    assert(readBytes > 0, "file-scheme read statistics unavailable")
    assert(readBytes < stateBytes * 2 / 5,
      s"small append read $readBytes of $stateBytes state bytes — " +
        "the pruned path should touch only matching bucket directories")
    // and correctness is untouched: the folded view is the whole corpus
    assert(labelsMap(dir).size == 2401)
  }

  // ---- bucket-wise compaction: bounded per-job input + resumability ----

  test("bucket-wise compaction: per-job input bounded well below state size, content exact") {
    val dir = Files.createTempDirectory("inc_bktcompact").toString
    val bulk = (0L until 2400L).map(i =>
      (i, s"document $i unique words a$i b$i c$i d e f g h"))
    IncrementalDedup.mergeBatch(docsDF(bulk), 0L, dir, compactEvery = 3)
    val d1 = Seq((900001L, "document 900001 unique words a900001 b1 c x y"))
    val d2 = Seq((900002L, "document 900002 unique words a900002 b2 c x y"))
    IncrementalDedup.mergeBatch(docsDF(d1), 1L, dir, compactEvery = 3)
    IncrementalDedup.mergeBatch(docsDF(d2), 2L, dir, compactEvery = 3)
    val stateBytes = dirBytes(dir)
    // capture per-JOB input bytes over the compaction batch: the folds
    // run one job per `_b` bucket, so no job may read O(corpus)
    val stageToJob = new scala.collection.concurrent.TrieMap[Int, Int]()
    val perJob = new scala.collection.concurrent.TrieMap[Int, Long]()
    @volatile var jobsEnded = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        j.stageIds.foreach(s => stageToJob.put(s, j.jobId))
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stageToJob.get(s.stageInfo.stageId).foreach { job =>
          val in = Option(s.stageInfo.taskMetrics)
            .map(_.inputMetrics.bytesRead).getOrElse(0L)
          perJob.put(job, perJob.getOrElse(job, 0L) + in)
        }
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobsEnded += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val d3 = Seq((900003L, "document 900003 unique words a900003 b3 c x"))
      // chain = [full v=0, v=1, v=2] ≥ compactEvery → compaction at v=3
      IncrementalDedup.mergeBatch(docsDF(d3), 3L, dir, compactEvery = 3)
      // listener events are async: wait until the end-count stabilizes
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var last = -1
      while (last != jobsEnded && System.nanoTime() < deadline) {
        last = jobsEnded; Thread.sleep(300)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // the compaction produced a bucket-wise full
    val v3 = new java.io.File(s"$dir/labels/v=3")
    assert(new java.io.File(v3, "_FULL").exists(), "v=3 must be a full")
    assert(v3.listFiles().count(_.getName.startsWith("_b=")) > 16,
      "bucket-wise full must be laid out in _b dirs")
    // per-job bound: each fold reads ~1/B of one kind's state (plus
    // footer/listing overhead); nothing may read a corpus-sized input.
    // stateBytes/8 gives 8× headroom over the theoretical 1/64 while
    // still failing loudly if any job folds a whole table again.
    val maxJob = perJob.values.max
    assert(maxJob < stateBytes / 8,
      s"a compaction job read $maxJob of $stateBytes state bytes — " +
        "per-bucket folds must stay bounded by the bucket, not the corpus")
    // content identical to a from-scratch recompute
    val all = bulk ++ d1 ++ d2 ++ Seq(
      (900003L, "document 900003 unique words a900003 b3 c x"))
    assert(labelsMap(dir) == truth(all))
    // and a replay of the compaction batch is still idempotent
    IncrementalDedup.mergeBatch(docsDF(Seq(
      (900003L, "document 900003 unique words a900003 b3 c x"))), 3L, dir,
      compactEvery = 3)
    assert(labelsMap(dir) == truth(all), "compaction replay changed state")
  }

  test("bucket-wise compaction resumes: completed tmp buckets are kept, partial ones rewritten") {
    val dir = Files.createTempDirectory("inc_bktresume").toString
    val bulk = (0L until 400L).map(i =>
      (i, s"resume doc $i words a$i b$i c$i d e f"))
    IncrementalDedup.mergeBatch(docsDF(bulk), 0L, dir, compactEvery = 2)
    IncrementalDedup.mergeBatch(docsDF(Seq(
      (900001L, "resume doc 900001 words a900001 b c d"))), 1L, dir,
      compactEvery = 2)
    // simulate a crashed compaction attempt for batch 2: bucket 0 already
    // folded (sentinel content + _SUCCESS → must be TRUSTED and kept:
    // replays re-derive identical content, so a skip is sound and is what
    // makes compaction resumable), bucket 1 partially written (no
    // _SUCCESS → must be overwritten by the real fold)
    val tmp = s"$dir/labels/.tmp_v_2"
    val sentinel = Seq((999999L, 999999L))
      .toDF("node", "label")
      .withColumn("removed", org.apache.spark.sql.functions.lit(false))
    sentinel.write.parquet(s"$tmp/_b=0")
    sentinel.write.parquet(s"$tmp/_b=1")
    new java.io.File(s"$tmp/_b=1/_SUCCESS").delete() // partial: no marker
    IncrementalDedup.mergeBatch(docsDF(Seq(
      (900002L, "resume doc 900002 words a900002 b c d"))), 2L, dir,
      compactEvery = 2)
    assert(new java.io.File(s"$dir/labels/v=2/_FULL").exists())
    val published = spark.read.parquet(s"$dir/labels/v=2")
    // the _SUCCESS-marked bucket survived verbatim (resume skipped it)
    assert(published.filter($"node" === 999999L).count() == 1,
      "a completed tmp bucket must be reused on resume, not re-folded")
    // the partial bucket was re-folded: its real nodes are present and
    // the sentinel is gone (bucket 1 holds nodes ≡ 1 mod 64)
    val b1nodes = spark.read.parquet(s"$dir/labels/v=2/_b=1")
      .select($"node").collect().map(_.getLong(0)).toSet
    assert(!b1nodes.contains(999999L),
      "a partial (no _SUCCESS) tmp bucket must be overwritten")
    assert(b1nodes.contains(1L) && b1nodes.contains(65L),
      s"re-folded bucket 1 must hold its real nodes, got $b1nodes")
  }

  // ---- legacy-state migration (pre-delta dirs: no `removed`, no `_FULL`,
  //      no `bands` table) ----

  /** Write a pre-delta-format state dir: labels + buckets snapshots with
    * the OLD schema (no `removed` column, no `_FULL` marker, no bands). */
  private def writeLegacyState(dir: String, docs: Seq[(Long, String)],
      ver: Long = 0L): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.{TextFns => T}
    val df = docsDF(docs)
    val labels = TextOps.clusterAssignments(df).toDF("node", "label")
    val bands = df
      .select($"doc_id", T.minhashSigUdf(3, 8)($"text").as("sig"))
      .filter($"sig".isNotNull)
      .select($"doc_id", explode(T.bandKeys($"sig", 4, 2)).as("bk"))
      .select($"doc_id", $"bk.band".as("band"), $"bk.bkey".as("bkey"))
    val buckets = bands.join(labels, $"doc_id" === $"node")
      .groupBy($"band", $"bkey").agg(min($"label").as("label"))
    labels.write.parquet(s"$dir/labels/v=$ver")
    buckets.write.parquet(s"$dir/buckets/v=$ver")
  }

  test("migration: legacy state folds as a full snapshot and serves appends") {
    val dir = Files.createTempDirectory("inc_legacy").toString
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (4L, "alpha beta gamma delta epsilon zeta"),
      (7L, "unrelated words occupy this document entirely"))
    writeLegacyState(dir, docs)
    // the old schema must read back (removed=false implied), not throw
    assert(labelsMap(dir) == truth(docs))
    // append-only maintenance continues on top of legacy state: the new
    // dup must link into the legacy cluster through the stored buckets
    val extra = Seq((9L, "alpha beta gamma delta epsilon zeta"))
    IncrementalDedup.mergeBatch(docsDF(extra), 1L, dir)
    val after = labelsMap(dir)
    assert(after == truth(docs ++ extra))
    assert(after(9L) == after(1L), "append must join the legacy cluster")
  }

  test("migration: two legacy snapshots fold newest-wins (no resurrection)") {
    val dir = Files.createTempDirectory("inc_legacy2").toString
    val v0 = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "other words entirely here now"), (3L, "third text lives apart"))
    // v=1 dropped doc 2 — pre-delta code rewrote complete snapshots, so
    // the reader must take v=1 WHOLE, not fold v=0's doc 2 back in
    val v1 = v0.filterNot(_._1 == 2L)
    writeLegacyState(dir, v0, ver = 0L)
    writeLegacyState(dir, v1, ver = 1L)
    assert(labelsMap(dir) == truth(v1), "newest legacy full must win wholesale")
  }

  test("migration: a relabeling append on legacy state fixes the bucket labels") {
    // the trap: legacy state stores NO band keys, so affected bucket rows
    // can't be found via member bands — a relabeling append must still
    // rewrite them (direct by-label fetch) or a LATER probe of those
    // buckets would resurrect the retired label
    val dir = Files.createTempDirectory("inc_legacy_rel").toString
    val text = "shared alpha beta gamma delta epsilon zeta"
    val docs = Seq((50L, text), (60L, text))
    writeLegacyState(dir, docs) // cluster {50,60} labeled 50
    // id 7 < 50 with the same text: relabels the legacy cluster to 7
    IncrementalDedup.mergeBatch(docsDF(Seq((7L, text))), 1L, dir)
    assert(labelsMap(dir) == Map(7L -> 7L, 50L -> 7L, 60L -> 7L))
    // a SECOND append probing the same buckets must see label 7, not 50
    IncrementalDedup.mergeBatch(docsDF(Seq((90L, text))), 2L, dir)
    assert(labelsMap(dir) ==
      Map(7L -> 7L, 50L -> 7L, 60L -> 7L, 90L -> 7L),
      "stale bucket labels after a legacy relabel")
  }

  test("migration: deletions on legacy state fail loudly, even after appends") {
    val dir = Files.createTempDirectory("inc_legacy_del").toString
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (4L, "alpha beta gamma delta epsilon zeta"))
    writeLegacyState(dir, docs)
    // an append first: creates a PARTIAL bands table (new doc only) —
    // the unsafe condition must survive it via the persisted marker
    IncrementalDedup.mergeBatch(docsDF(Seq(
      (9L, "fresh words for the post-migration doc"))), 1L, dir)
    val e = intercept[IllegalStateException] {
      IncrementalDedup.mergeBatch(opsDF(Seq((1L, "", "del"))), 2L, dir)
    }
    assert(e.getMessage.contains("rebuild"), e.getMessage)
    // a born-modern dir is unaffected by the guard
    val fresh = Files.createTempDirectory("inc_modern").toString
    IncrementalDedup.mergeBatch(docsDF(docs), 0L, fresh)
    IncrementalDedup.mergeBatch(opsDF(Seq((1L, "", "del"))), 1L, fresh)
    assert(labelsMap(fresh) == truth(docs.filterNot(_._1 == 1L)))
  }

  test("maintain(): streamed batches land in the versioned state") {
    implicit val s = spark
    val dir = Files.createTempDirectory("inc_stream").toString
    val ckpt = Files.createTempDirectory("inc_ckpt").toString
    val input = MemoryStream[(Long, String)](spark)
    val q = IncrementalDedup.maintain(
      input.toDF().toDF("doc_id", "text"), dir, ckpt)
    try {
      input.addData((1L, "one two three four five"))
      q.processAllAvailable()
      input.addData((9L, "one two three four five"))
      q.processAllAvailable()
      val m = labelsMap(dir)
      assert(m == Map(1L -> 1L, 9L -> 1L))
    } finally q.stop()
  }
}
