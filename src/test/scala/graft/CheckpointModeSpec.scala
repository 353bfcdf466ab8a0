package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GraphAlgos, GraphOps, Iterate, LangModelOps}

/** The iterate-checkpoint knob (graft.operators.Iterate): local and
  * reliable modes must return BIT-IDENTICAL results on every iterative
  * algorithm (they're integer-exact, so equality is provable), and the
  * reliable mode must survive losing every cached block — the
  * executor-loss story a multi-hour 100 TB loop needs. */
class CheckpointModeSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val ckptDir =
    java.nio.file.Files.createTempDirectory("graft_iter_ckpt").toString

  private def withMode[T](mode: String)(body: => T): T = {
    spark.conf.set(Iterate.ModeKey, mode)
    spark.conf.set(Iterate.DirKey, ckptDir)
    try body finally {
      spark.conf.unset(Iterate.ModeKey)
      spark.conf.unset(Iterate.DirKey)
    }
  }

  // a seeded random digraph with hubs, chains, and a dangling tail
  private def edges: DataFrame = {
    val rnd = new scala.util.Random(7L)
    val es = (0 until 600).map(_ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)) ++
      (0 until 40).map(i => (i.toLong, (i + 1).toLong)) ++
      Seq((120L, 121L)) // 121 is dangling
    es.filter(e => e._1 != e._2).toDF("src", "dst")
  }

  private def seeds: DataFrame = Seq(3L, 17L, 42L).toDF("node")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("local and reliable modes are bit-identical on every loop") {
    val runs: Seq[(String, () => DataFrame)] = Seq(
      ("pagerank", () => GraphOps.pagerank(edges, iters = 4)),
      ("trustrank", () => GraphOps.trustrank(edges, seeds, iters = 3)),
      ("kcore", () => GraphAlgos.kCore(edges, k = 4)),
      ("bfs", () => GraphAlgos.bfsLayers(edges, seeds, maxHops = 4)),
      ("spread", () => GraphAlgos.labelSpread(edges,
        seeds.withColumn("label",
          concat(lit("L"), col("node") % 2)), iters = 3)),
      ("hits", () => GraphAlgos.hits(edges, iters = 3)),
      ("walks", () => GraphAlgos.randomWalks(edges, seeds,
        walksPerSeed = 2, steps = 4)),
      // the one non-graph loop the knob governs: BPE training's k-deep
      // merge loop checkpoints per iteration through Iterate too
      ("bpe_train", () => LangModelOps.trainBpeMerges(
        Seq("the cat sat on the mat", "the bat and the rat sat there",
          "that cat and that rat chat", "the thin hen sat on the mat")
          .toDF("text"), k = 6)))
    runs.foreach { case (name, run) =>
      val local = withMode("local") { sortedRows(run()) }
      val reliable = withMode("reliable") { sortedRows(run()) }
      assert(local == reliable, s"$name diverged across checkpoint modes")
      assert(local.nonEmpty, s"$name returned nothing")
    }
  }

  test("reliable mode survives losing every cached block; local cannot") {
    def killBlocks(): Unit = {
      // simulate executor loss for checkpoint state: drop every
      // persisted RDD's blocks (localCheckpoint stores live ONLY here;
      // reliable checkpoints live as files under the checkpoint dir)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    try {
      val reliable = withMode("reliable") { GraphOps.pagerank(edges, 3) }
      val before = sortedRows(reliable)
      killBlocks()
      val after = sortedRows(reliable) // recomputes from checkpoint files
      assert(before == after, "reliable mode lost data after block loss")

      val local = withMode("local") { GraphOps.pagerank(edges, 3) }
      local.count()
      killBlocks()
      intercept[Exception] { local.count() } // non-replayable, by design
    } finally {
      // killBlocks strands any session memo materialized by an earlier
      // suite (the documented executor-loss case) — evict them so later
      // suites rebuild instead of reading dead blocks
      GraphOps.invalidateMemos(spark)
      graft.operators.VectorOps.invalidateMemos(spark)
    }
  }

  test("reliable mode actually writes to the checkpoint dir, loudly requires one") {
    // setCheckpointDir is SESSION-GLOBAL and Iterate honors a dir some
    // earlier suite already pinned (the documented contract) — so
    // measure growth of the EFFECTIVE dir, wherever it is
    def fileCount(): Int = spark.sparkContext.getCheckpointDir.map { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.getContentSummary(p).getFileCount.toInt else 0
    }.getOrElse(0)
    withMode("reliable") {
      GraphOps.pagerank(edges, 1).count() // pins the dir if unset
      val before = fileCount()
      GraphAlgos.kCore(edges, k = 3).count()
      assert(fileCount() > before, "no reliable checkpoint data written")
    }

    // bad mode value refuses loudly
    spark.conf.set(Iterate.ModeKey, "ha")
    try intercept[IllegalArgumentException] {
      GraphOps.pagerank(edges, 1).count()
    } finally spark.conf.unset(Iterate.ModeKey)
  }
}
