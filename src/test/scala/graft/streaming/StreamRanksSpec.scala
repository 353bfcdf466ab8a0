package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.{GraphArtifact, GraphOps, RankArtifact}

/** Streaming rank maintenance: after EVERY micro-batch the served
  * ranks must equal a from-scratch PageRank over the resolved edge
  * store (the batch recompute), and every tear point of the
  * append-then-refresh composite must converge on replay. */
class StreamRanksSpec extends SparkSpecBase {
  import spark.implicits._

  private def ranksOf(dir: String): Map[Long, Long] =
    RankArtifact.readRanks(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def truthOf(edgesDir: String, iters: Int): Map[Long, Long] =
    GraphOps.pagerank(GraphArtifact.readAdjacency(spark, edgesDir), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("maintained ranks equal the batch recompute after every micro-batch") {
    val root = java.nio.file.Files.createTempDirectory("stream_ranks").toString
    val in = MemoryStream[(Long, Long, String)](spark)
    val q = StreamRanks.maintain(
      in.toDF().toDF("src", "dst", "op"),
      s"$root/e", s"$root/r", s"$root/ckpt", iters = 3, nBuckets = 8)
    try {
      val batches = Seq(
        // bootstrap: a ring + a tail
        (1 to 6).map(i => (i.toLong, (i % 6 + 1).toLong, "add")) :+
          (6L, 7L, "add"),
        // growth + a deletion that disconnects the tail node entirely
        Seq((2L, 9L, "add"), (6L, 7L, "del")),
        // resurrection + more churn
        Seq((7L, 3L, "add"), (9L, 10L, "add"), (1L, 2L, "del")))
      batches.foreach { b =>
        in.addData(b: _*)
        q.processAllAvailable()
        val got = ranksOf(s"$root/r")
        val want = truthOf(s"$root/e", 3)
        assert(got == want, s"ranks diverged after batch $b")
        assert(got.nonEmpty)
      }
    } finally q.stop()
  }

  test("every tear point of append-then-refresh converges on replay") {
    val root = java.nio.file.Files.createTempDirectory("stream_ranks2").toString
    val b0 = Seq((1L, 2L, "add"), (2L, 3L, "add"), (3L, 4L, "add"))
      .toDF("src", "dst", "op")
    assert(StreamRanks.maintainBatch(b0, 0L, s"$root/e", s"$root/r",
      iters = 3, nBuckets = 8) == "bootstrap")

    // tear BETWEEN append and refresh: publish the edge delta alone
    // (as if the refresh crashed), then replay the composite — the
    // append skips via its tag, the refresh still brings coverage up
    val b1 = Seq((4L, 5L, "add"), (1L, 2L, "del")).toDF("src", "dst", "op")
    assert(StreamGraph.maintainBatch(b1, 1L, s"$root/e", nBuckets = 8))
    assert(StreamRanks.maintainBatch(b1, 1L, s"$root/e", s"$root/r",
      iters = 3, nBuckets = 8) == "delta")
    assert(ranksOf(s"$root/r") == truthOf(s"$root/e", 3))

    // tear AFTER the refresh: a full replay of the same batch no-ops
    assert(StreamRanks.maintainBatch(b1, 1L, s"$root/e", s"$root/r",
      iters = 3, nBuckets = 8) == "noop")
    assert(ranksOf(s"$root/r") == truthOf(s"$root/e", 3))

    // a mid-stream edge COMPACTION (full rebuild, the only legal one)
    // is absorbed: the next maintained batch reports "rebuild" and the
    // chain restarts exactly — this is ALSO the crash window between
    // the joint policy's compactEdges and its rank restamp (the ranks'
    // lineage names a dead generation; one recompute re-anchors it)
    GraphArtifact.writeEdges(
      GraphArtifact.readEdges(spark, s"$root/e")
        .select(col("a").as("src"), col("b").as("dst")),
      s"$root/e", nBuckets = 8)
    val b2 = Seq((5L, 6L, "add")).toDF("src", "dst", "op")
    assert(StreamRanks.maintainBatch(b2, 2L, s"$root/e", s"$root/r",
      iters = 3, nBuckets = 8) == "rebuild")
    assert(ranksOf(s"$root/r") == truthOf(s"$root/e", 3))
  }

  test("joint auto-compaction bounds both chains; ranks stay exact") {
    val root = java.nio.file.Files.createTempDirectory("stream_ranks3")
      .toString
    val every = 3
    var edgeGens = Set.empty[String]
    // 6 batches: the chain traces 1,2,compact→0, 1,2,compact→0 — the
    // LAST batch triggers a joint compaction, setting up the replay leg
    for (i <- 0L until 6L) {
      val b = (Seq((i, i + 1L, "add"), (i, i + 20L, "add")) ++
          (if (i >= 2) Seq((i - 2L, i - 1L, "del")) else Nil))
        .toDF("src", "dst", "op")
      val st = StreamRanks.maintainBatch(b, i, s"$root/e", s"$root/r",
        iters = 2, nBuckets = 8, compactEvery = every)
      assert(st == (if (i == 0) "bootstrap" else "delta"),
        s"batch $i: unexpected status $st")
      assert(ranksOf(s"$root/r") == truthOf(s"$root/e", 2),
        s"ranks diverged after batch $i")
      val ec = GraphArtifact.chainLength(spark, s"$root/e")
      val rc = RankArtifact.chainLength(spark, s"$root/r")
      assert(ec < every && rc < every,
        s"chains not bounded after batch $i: edges=$ec ranks=$rc")
      edgeGens += new org.apache.hadoop.fs.Path(
        GraphArtifact.edgesGenDir(spark, s"$root/e")).getName
    }
    // 6 batches at compactEvery=3 joint-compacted twice, and a joint
    // compaction restamps the fold's lineage to the fresh edge
    // generation with zero covered tags
    assert(edgeGens.size >= 3, s"expected ≥3 edge generations, saw $edgeGens")
    val (covGen, covTags) = RankArtifact.coverage(spark, s"$root/r")
    val (curGen, curTags) = GraphArtifact.coverage(spark, s"$root/e")
    assert(covGen == curGen && covTags.toSet == curTags.toSet,
      "rank lineage out of step with the edge store")
    assert(covTags.isEmpty, "a just-compacted pair must cover zero tags")

    // replay of the last batch — its tag died with the compaction it
    // triggered (the crash-before-checkpoint window): the re-append is
    // idempotent on resolved content, the refresh sees exactly the one
    // re-appended tag — "delta" — and the served ranks are unchanged
    val before = ranksOf(s"$root/r")
    val b5 = (Seq((5L, 6L, "add"), (5L, 25L, "add")) ++
        Seq((3L, 4L, "del"))).toDF("src", "dst", "op")
    val replaySt = StreamRanks.maintainBatch(b5, 5L, s"$root/e", s"$root/r",
      iters = 2, nBuckets = 8, compactEvery = every)
    assert(replaySt == "delta", s"replay status $replaySt")
    assert(ranksOf(s"$root/r") == before,
      "replay after joint compaction changed the served ranks")
    assert(ranksOf(s"$root/r") == truthOf(s"$root/e", 2))
  }
}
