package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.RankArtifact

/** Streaming maintenance of the RANK artifact — the centrality dual of
  * [[StreamGraph]]: the same (src, dst, op) interaction stream keeps
  * BOTH stores current, so between any two micro-batches a consumer
  * reads always-fresh PageRank without ever paying a full recompute.
  *
  * Per micro-batch: one exactly-once edge append
  * ([[StreamGraph.maintainBatch]] — the tag ledger), then one exact
  * incremental rank refresh ([[RankArtifact.refreshRanks]] — the
  * `_covered` ledger). The composite is exactly-once under ANY tear
  * point because both halves are idempotent on their own ledgers:
  *
  *  - crash BEFORE the append publishes → replay appends + refreshes;
  *  - crash BETWEEN append and refresh → replay skips the append
  *    (tag committed) but the refresh still sees the uncovered tags
  *    and brings the ranks up — convergence, not duplication;
  *  - crash AFTER the refresh → replay skips the append AND the
  *    refresh no-ops (coverage already recorded).
  *
  * Refresh cost per batch is O(dirty ball) — the IncrementalDedup
  * pricing discipline — with the [[RankArtifact.MaxDeltaBallNodes]]
  * recompute fallback for batches whose blast radius approaches the
  * graph. Bootstrap: the first batch of fresh dirs creates the empty
  * edge generation, then a full (tiny) rank compute pinned to it.
  * An edge-artifact REBUILD mid-stream (the only legal compaction,
  * per StreamGraph) is absorbed automatically: the next refresh sees
  * the generation change and recomputes ("rebuild").
  */
object StreamRanks {

  /** One micro-batch of edge + rank maintenance; idempotent per
    * (dirs, batchId). Returns the refresh status ("bootstrap" when the
    * rank artifact was first built; else [[RankArtifact.refreshRanks]]'s
    * noop | delta | recompute | rebuild). */
  def maintainBatch(batch: DataFrame, batchId: Long, edgesDir: String,
      rankDir: String, iters: Int = 5, nBuckets: Int = 64): String = {
    val s = batch.sparkSession
    StreamGraph.maintainBatch(batch, batchId, edgesDir, nBuckets)
    val hfs = new org.apache.hadoop.fs.Path(rankDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!hfs.exists(new org.apache.hadoop.fs.Path(rankDir, "CURRENT"))) {
      RankArtifact.writeRanks(s, edgesDir, rankDir, iters,
        nBuckets = nBuckets)
      "bootstrap"
    } else RankArtifact.refreshRanks(s, edgesDir, rankDir)
  }

  /** Wire a stream of (src, dst, op ∈ add|del) rows into maintained
    * edge + rank artifacts. `iters`/`nBuckets` only matter when the
    * first batch bootstraps fresh dirs — after that both travel with
    * the artifacts' metadata. */
  def maintain(edgeOps: DataFrame, edgesDir: String, rankDir: String,
      checkpoint: String, iters: Int = 5,
      nBuckets: Int = 64): StreamingQuery =
    edgeOps.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        maintainBatch(batch.toDF(), batchId, edgesDir, rankDir, iters,
          nBuckets)
        ()
      }
      .start()
}
