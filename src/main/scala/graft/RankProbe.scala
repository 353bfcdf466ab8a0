package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{GraphArtifact, GraphOps, Iterate, RankArtifact}

/** Scale probe for the rank artifact (round-13 verdict tasks #2/#5):
  * on the mult×-inflated co-purchase graph,
  *
  *  1. price the INCREMENTAL refresh against the full recompute for a
  *     small append — the delta-gated path must cost O(dirty), not
  *     O(graph), and the served ranks must equal the from-scratch
  *     recompute EXACTLY (distributed compare, zero collects of data);
  *  2. price overlay-chain READ AMPLIFICATION (round-14: the
  *     auto-compaction story) — serve the ranks at chain length 1,
  *     grow the chain to 8 with further append+refresh batches, serve
  *     again, FOLD ([[RankArtifact.compactRanks]]) and serve the
  *     compacted base — the fold must restore chain-1 read cost and be
  *     bit-identical to the chain it folded;
  *  3. price the reliable-checkpoint mode against the default local
  *     mode on the same PageRank — the per-iteration cluster-FS write
  *     is the cost of surviving executor loss, and the results must be
  *     bit-identical.
  *
  * Usage: runMain graft.RankProbe [sfDir] [mult]
  */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"RANK $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def sameRanks(a: DataFrame, b: DataFrame, what: String): Unit = {
      val al = a.select(col("node"), col("rank").as("ra"))
      val bl = b.select(col("node"), col("rank").as("rb"))
      val mism = al.join(bl, Seq("node"), "full")
        .filter(col("ra").isNull || col("rb").isNull ||
          col("ra") =!= col("rb")).count()
      require(mism == 0L, s"$what: $mism mismatched/missing ranks")
    }

    val e1 = GraphOps.copurchaseEdges(
      graft.sources.Tables.lineitem(spark, sfDir)).cache()
    val off = 1000000000L
    val eM = (0 until mult).map { i =>
      e1.select((col("src") + lit(i * off)).as("src"),
        (col("dst") + lit(i * off)).as("dst"))
    }.reduce(_ union _).cache()
    // SMALL deltas, fixed-size-ish: thin slices of copy 0 only — slice
    // 0 feeds the refresh-pricing leg, slices 1..7 grow the chain for
    // the read-amplification leg, so every append is genuinely new
    def slice(k: Int) = col("src") < off &&
      pmod(col("src") + col("dst"), lit(101)) === k
    val delta = eM.filter(slice(0)).cache()
    val base = eM.filter(!(col("src") < off &&
      pmod(col("src") + col("dst"), lit(101)) < 8))
    println(s"edges=${eM.count()} (${mult}x), delta=${delta.count()}")

    val dir = s"/tmp/graft_rankprobe_$mult"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))

    timed("write_edges")(GraphArtifact.writeEdges(base, s"$dir/e"))
    timed("full_compute")(
      RankArtifact.writeRanks(spark, s"$dir/e", s"$dir/r", iters = 5))
    timed("append_delta")(
      GraphArtifact.appendEdges(delta, s"$dir/e", "b000001"))
    val st = timed("refresh")(
      RankArtifact.refreshRanks(spark, s"$dir/e", s"$dir/r"))
    require(st == "delta", s"expected the incremental path, got `$st`")
    val served = RankArtifact.readRanks(spark, s"$dir/r")
    val truth = timed("recompute_truth")(GraphOps.pagerank(
      GraphArtifact.readAdjacency(spark, s"$dir/e"), iters = 5)
      .localCheckpoint(true))
    timed("gate_exact")(sameRanks(served, truth, "refresh-vs-recompute"))
    println(s"refresh ≡ recompute on ${truth.count()} nodes")

    // ── overlay-chain read amplification (the auto-compaction pricing):
    // serving cost at chain length 1, at chain length 8, and after the
    // fold — a maintained stream without compaction pays the middle
    // number FOREVER, growing linearly with batches
    def serveOnce(tag: String): Unit = timed(tag)(
      RankArtifact.readRanks(spark, s"$dir/r")
        .write.mode("overwrite").format("noop").save())
    serveOnce("serve_chain1")
    timed("grow_chain_to_8")(for (k <- 1 to 7) {
      GraphArtifact.appendEdges(eM.filter(slice(k)), s"$dir/e",
        f"b${k + 1}%06d")
      val s = RankArtifact.refreshRanks(spark, s"$dir/e", s"$dir/r")
      require(s == "delta", s"slice $k: expected delta, got `$s`")
    })
    serveOnce("serve_chain8")
    val chainServed = RankArtifact.readRanks(spark, s"$dir/r")
      .localCheckpoint(true)
    timed("fold_compact")(RankArtifact.compactRanks(spark, s"$dir/r"))
    serveOnce("serve_folded")
    timed("gate_fold")(sameRanks(chainServed,
      RankArtifact.readRanks(spark, s"$dir/r"), "fold-vs-chain"))
    println(s"fold ≡ chain at length 8; chain after fold = " +
      RankArtifact.chainLength(spark, s"$dir/r"))

    // checkpoint-mode pricing: same graph, same recurrence, both modes
    val prLocal = timed("pagerank_local")(
      GraphOps.pagerank(eM, 5).localCheckpoint(true))
    spark.conf.set(Iterate.ModeKey, "reliable")
    spark.conf.set(Iterate.DirKey, s"$dir/ckpt")
    val prRel =
      try timed("pagerank_reliable")(
        GraphOps.pagerank(eM, 5).localCheckpoint(true))
      finally {
        spark.conf.unset(Iterate.ModeKey)
        spark.conf.unset(Iterate.DirKey)
      }
    timed("gate_modes")(sameRanks(prLocal, prRel, "local-vs-reliable"))
    println(s"checkpoint modes bit-identical on ${prLocal.count()} nodes")
    spark.stop()
  }
}
