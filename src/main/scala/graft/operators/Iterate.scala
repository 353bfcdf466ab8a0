package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-iteration materialization for the engine's iterative loops —
  * PageRank-family (GraphOps), k-core/BFS/label-spread/HITS/walks
  * (GraphAlgos), the q58 CC loop (TextOps), BPE training
  * (LangModelOps.trainBpeMerges), and the rank-artifact refresh
  * (RankArtifact) — EVERY multi-iteration loop in the engine, behind
  * ONE knob:
  *
  *   - `spark.graft.iterate.checkpointMode = local` (default): eager
  *     `localCheckpoint` — truncates lineage with executor-local
  *     blocks. Fast (no filesystem round-trip), and right for local[]
  *     and for clusters that prefer retry-over-HA; but the blocks are
  *     NON-REPLAYABLE — an executor loss mid-loop kills the query.
  *   - `spark.graft.iterate.checkpointMode = reliable`: eager reliable
  *     `checkpoint` to the session's checkpoint dir (set it via
  *     `SparkContext.setCheckpointDir` or
  *     `spark.graft.iterate.checkpointDir`). Each iteration lands on
  *     the cluster FS and is recomputable after any executor loss —
  *     the honest answer for a multi-hour 100 TB PageRank, bought with
  *     one distributed write per iteration (priced by GraphProbe's
  *     ckpt leg; see SURVEY round-13 notes).
  *
  * Both modes truncate lineage identically, so plans stay
  * constant-depth at any iteration count, and both return
  * BIT-IDENTICAL results (the algorithms are integer-exact;
  * CheckpointModeSpec pins equality per algorithm and the
  * reliable-mode sweep leg re-proves every graph oracle).
  *
  * RETENTION: reliable mode writes one full materialization per
  * iteration under the checkpoint dir and Spark does NOT clean them up
  * by default (`spark.cleaner.referenceTracking.cleanCheckpoints`
  * defaults to false) — a multi-hour 100 TB loop accumulates
  * iterations × dataset-size on the cluster FS. Set that conf to true
  * so superseded iteration checkpoints are GC'd once their RDDs go out
  * of scope, or clean the checkpoint dir between runs (the sweep
  * harness recreates /tmp/graft_sweep_ckpt per invocation for the same
  * reason). The LAST iteration's checkpoint must outlive the loop —
  * callers return DataFrames backed by it — which is exactly what
  * reference-tracked cleanup (not a blanket delete) preserves. */
object Iterate {

  val ModeKey = "spark.graft.iterate.checkpointMode"
  val DirKey = "spark.graft.iterate.checkpointDir"

  /** Eagerly materialize `df` and truncate its lineage per the
    * session's checkpoint mode (see object doc). */
  def checkpoint(df: DataFrame): DataFrame = checkpoint(df, eager = true)

  /** The loop-body form: `df.transform(Iterate.ckpt)` reads like the
    * `.localCheckpoint(true)` it replaces. */
  val ckpt: DataFrame => DataFrame = checkpoint(_, eager = true)

  /** FUSED loop-body form for the common "checkpoint, then immediately
    * run a full-scan driver action" iteration shape (the dangling-mass
    * sum in PageRank, the survivor count in k-core, the rescale max in
    * HITS, the convergence checksum the CC loop already fuses this
    * way): in `local` mode the checkpoint is marked LAZILY, so the
    * scalar action's own job computes and caches the blocks — one job
    * per iteration instead of two, with identical results (the blocks
    * land exactly once either way; the round-17 fusion measured ~1.4×
    * on the PageRank family at sf0.1, where per-job scheduling latency
    * dominates tiny-data iterations, and is latency-neutral at scale).
    * Under `reliable` mode this stays EAGER: a lazy reliable checkpoint
    * re-executes the plan when the checkpoint file is written (the
    * classic double-compute), which costs strictly more at cluster
    * scale than the one scalar job the fusion would save.
    *
    * Use ONLY when a full-partition-scan action (aggregate/count over
    * the whole frame, a dependent next iteration, or the final output
    * action) follows before any multi-consumer fan-out: an action that
    * touches a subset of partitions (`limit(1)`) materializes only what
    * it reads, and two consumers racing an unmaterialized checkpoint
    * inside one job can compute a partition twice — the eager form is
    * the right tool there. */
  val ckptFused: DataFrame => DataFrame = df => {
    val s = df.sparkSession
    s.conf.getOption(ModeKey).getOrElse("local") match {
      case "local" => df.localCheckpoint(false)
      case _ => checkpoint(df, eager = true)
    }
  }

  def checkpoint(df: DataFrame, eager: Boolean): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(ModeKey).getOrElse("local") match {
      case "local" => df.localCheckpoint(eager)
      case "reliable" =>
        ensureCheckpointDir(s)
        df.checkpoint(eager)
      case other => throw new IllegalArgumentException(
        s"Iterate: bad $ModeKey '$other' — use local | reliable")
    }
  }

  private def ensureCheckpointDir(s: SparkSession): Unit =
    if (s.sparkContext.getCheckpointDir.isEmpty) {
      val dir = s.conf.getOption(DirKey).filter(_.nonEmpty).getOrElse(
        throw new IllegalStateException(
          s"Iterate: $ModeKey=reliable needs a checkpoint dir — call " +
            s"SparkContext.setCheckpointDir or set $DirKey"))
      s.sparkContext.setCheckpointDir(dir)
    }
}
