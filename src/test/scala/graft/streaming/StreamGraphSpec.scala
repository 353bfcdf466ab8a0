package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.{GraphArtifact, GraphOps}

/** Streaming maintenance of the adjacency artifact (StreamGraph +
  * operators/GraphArtifact): after EVERY batch the artifact must
  * resolve to exactly the reference state machine's edge set (adds,
  * deletes, re-adds, duplicates), replays must be absorbed, probes must
  * prune to one bucket, and a mid-stream rebuild (compaction) must
  * preserve state while clearing history. */
class StreamGraphSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_sgraph_").toString

  /** Reference: sequential set semantics over (src, dst, op) batches. */
  private def refApply(state: Set[(Long, Long)],
      batch: Seq[(Long, Long, String)]): Set[(Long, Long)] = {
    val norm = batch.flatMap { case (s, d, op) =>
      if (s == d) None
      else Some((math.min(s, d), math.max(s, d), op))
    }.distinct
    val adds = norm.collect { case (a, b, "add") => (a, b) }.toSet
    val dels = norm.collect { case (a, b, "del") => (a, b) }.toSet
    state -- dels ++ adds
  }

  private def readSet(dir: String): Set[(Long, Long)] =
    GraphArtifact.readEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("maintained artifact ≡ reference state machine after every batch") {
    val dir = tmp()
    val batches = Seq(
      Seq((1L, 2L, "add"), (2L, 3L, "add"), (3L, 1L, "add"),
        (2L, 1L, "add"), (4L, 4L, "add")), // dup orientation + self-loop
      Seq((1L, 2L, "del"), (4L, 5L, "add")),
      Seq((2L, 1L, "add"), (4L, 5L, "del")), // re-add resurrects
      Seq((9L, 8L, "add")))
    var state = Set.empty[(Long, Long)]
    batches.zipWithIndex.foreach { case (b, i) =>
      val published = StreamGraph.maintainBatch(
        b.toDF("src", "dst", "op"), i.toLong, dir, nBuckets = 8)
      assert(published, s"batch $i should publish")
      state = refApply(state, b)
      assert(readSet(dir) == state, s"state diverged after batch $i")
    }
    // degrees and neighbors agree with the reference state
    val degs = GraphArtifact.degreesStored(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val refDegs = state.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(degs == refDegs)
    val n2 = GraphArtifact.neighborsStored(spark, dir, 2L)
      .collect().map(_.getLong(0)).toSet
    assert(n2 == state.collect {
      case (a, b) if a == 2L => b
      case (a, b) if b == 2L => a
    })
  }

  test("replayed batch id skips without corrupting state") {
    val dir = tmp()
    assert(StreamGraph.maintainBatch(
      Seq((1L, 2L, "add")).toDF("src", "dst", "op"), 0L, dir, 8))
    assert(StreamGraph.maintainBatch(
      Seq((2L, 3L, "add")).toDF("src", "dst", "op"), 1L, dir, 8))
    // replay batch 1 with DIFFERENT content: the ledger must win
    assert(!StreamGraph.maintainBatch(
      Seq((7L, 8L, "add")).toDF("src", "dst", "op"), 1L, dir, 8))
    assert(readSet(dir) == Set((1L, 2L), (2L, 3L)))
  }

  test("same edge added and deleted in one batch fails loudly, nothing publishes") {
    val dir = tmp()
    assert(StreamGraph.maintainBatch(
      Seq((1L, 2L, "add")).toDF("src", "dst", "op"), 0L, dir, 8))
    val e = intercept[IllegalStateException] {
      StreamGraph.maintainBatch(
        Seq((3L, 4L, "add"), (4L, 3L, "del")).toDF("src", "dst", "op"),
        1L, dir, 8)
    }
    assert(e.getMessage.contains("no deterministic winner"))
    assert(readSet(dir) == Set((1L, 2L)), "failed batch must not publish")
    // an unknown op is refused too
    val e2 = intercept[IllegalStateException] {
      StreamGraph.maintainBatch(
        Seq((5L, 6L, "upsert")).toDF("src", "dst", "op"), 2L, dir, 8)
    }
    assert(e2.getMessage.contains("only add/del"))
    // and a NULL op must not slip through isin()'s three-valued logic
    val e3 = intercept[IllegalStateException] {
      StreamGraph.maintainBatch(
        Seq((5L, 6L, null: String)).toDF("src", "dst", "op"), 3L, dir, 8)
    }
    assert(e3.getMessage.contains("only add/del"))
  }

  test("neighbor probe reads exactly one bucket (partition-pruned)") {
    val dir = tmp()
    StreamGraph.maintainBatch(
      (1L to 40L).map(i => (i, i + 100L, "add")).toDF("src", "dst", "op"),
      0L, dir, nBuckets = 16)
    val probe = GraphArtifact.neighborsStored(spark, dir, 7L)
    val plan = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"neighbor probe must carry a bucket partition filter:\n$plan")
    assert(probe.collect().map(_.getLong(0)).toSet == Set(107L))
  }

  test("mid-stream rebuild compacts history and preserves state") {
    val dir = tmp()
    var state = Set.empty[(Long, Long)]
    val pre = Seq(
      Seq((1L, 2L, "add"), (2L, 3L, "add")),
      Seq((1L, 2L, "del"), (3L, 4L, "add")))
    pre.zipWithIndex.foreach { case (b, i) =>
      StreamGraph.maintainBatch(b.toDF("src", "dst", "op"), i.toLong, dir, 8)
      state = refApply(state, b)
    }
    // compaction: full rebuild from the resolved state
    GraphArtifact.writeEdges(
      GraphArtifact.readEdges(spark, dir)
        .select(col("a").as("src"), col("b").as("dst")), dir, 8)
    assert(readSet(dir) == state, "rebuild must preserve the state")
    // maintenance continues on the new generation (fresh tag namespace)
    val b3 = Seq((5L, 6L, "add"))
    StreamGraph.maintainBatch(b3.toDF("src", "dst", "op"), 2L, dir, 8)
    state = refApply(state, b3)
    assert(readSet(dir) == state)
    // the old generation is reclaimable after the grace cycle
    assert(GraphArtifact.expireEdgeGenerations(spark, dir) >= 0)
    assert(readSet(dir) == state)
  }

  test("end-to-end through a real MemoryStream with kill-restart") {
    val dir = tmp()
    val ckpt = tmp()
    val in = MemoryStream[(Long, Long, String)](spark)
    def start() = StreamGraph.maintain(
      in.toDF().toDF("src", "dst", "op"), dir, ckpt, nBuckets = 8)
    var q = start()
    in.addData((1L, 2L, "add"), (2L, 3L, "add"))
    q.processAllAvailable()
    in.addData((1L, 2L, "del"))
    q.processAllAvailable()
    q.stop() // kill
    q = start() // restart from the checkpoint
    in.addData((4L, 5L, "add"))
    q.processAllAvailable()
    q.stop()
    assert(readSet(dir) == Set((2L, 3L), (4L, 5L)))
    // the batch that ran before the kill must not re-apply: 3 tags total
    val genDir = GraphArtifact.edgesGenDir(spark, dir)
    val hfs = new org.apache.hadoop.fs.Path(genDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tags = hfs.listStatus(
      new org.apache.hadoop.fs.Path(genDir, "appends"))
      .map(_.getPath.getName).filterNot(_.startsWith("."))
    assert(tags.length == 3, s"expected 3 committed tags, got " +
      tags.mkString(", "))
  }

  test("auto-compaction bounds the chain; replay after it is content-exact") {
    val dir = tmp()
    val every = 3
    var state = Set.empty[(Long, Long)]
    var gens = Set.empty[String]
    val batches: Seq[Seq[(Long, Long, String)]] =
      (0 until 10).map { i =>
        // churn: every batch adds two edges and deletes one added
        // earlier, so compactions fold real tombstones, not just adds
        Seq((i.toLong, i + 1L, "add"), (i.toLong, i + 50L, "add")) ++
          (if (i >= 2) Seq((i - 2L, i - 1L, "del")) else Nil)
      }
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamGraph.maintainBatch(b.toDF("src", "dst", "op"), i.toLong, dir,
        nBuckets = 8, compactEvery = every)
      state = refApply(state, b)
      assert(readSet(dir) == state, s"state diverged after batch $i")
      val chain = GraphArtifact.chainLength(spark, dir)
      assert(chain < every,
        s"chain $chain not bounded by compactEvery=$every after batch $i")
      gens += new org.apache.hadoop.fs.Path(
        GraphArtifact.edgesGenDir(spark, dir)).getName
    }
    // 10 batches at compactEvery=3 must have compacted ≥ 3 times
    assert(gens.size >= 4, s"expected ≥4 generations, saw $gens")
    // replay of the LAST batch: its tag died with the final compaction
    // iff one just fired — either way the resolved content is unchanged
    // (edge ops are idempotent on the resolved state)
    StreamGraph.maintainBatch(
      batches.last.toDF("src", "dst", "op"), 9L, dir,
      nBuckets = 8, compactEvery = every)
    assert(readSet(dir) == state, "replay after compaction changed content")
    assert(GraphArtifact.chainLength(spark, dir) < every)
  }

  test("maintained artifact feeds the batch operators (pagerank over readEdges)") {
    val dir = tmp()
    StreamGraph.maintainBatch(
      Seq((1L, 2L, "add"), (2L, 3L, "add"), (3L, 1L, "add"))
        .toDF("src", "dst", "op"), 0L, dir, 8)
    val viaArtifact = GraphOps.pagerank(
      GraphArtifact.readEdges(spark, dir)
        .select(col("a").as("src"), col("b").as("dst")), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = GraphOps.pagerank(
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaArtifact == direct)
  }
}
