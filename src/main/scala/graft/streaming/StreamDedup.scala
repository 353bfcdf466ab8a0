package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{TextFns => T}

/** Streaming near-duplicate detection — the ingest-time form of the batch
  * MinHash-LSH dedup (q35/q58): a continuously-arriving document stream is
  * checked against everything already admitted, per LSH band bucket.
  *
  * Shape: one pass computes the KM-MinHash signature (same fused UDF as the
  * batch path, so batch and stream agree on what "near-dup" means), each doc
  * fans out to its 4 band buckets, and a `flatMapGroupsWithState` keyed on
  * the bucket compares arrivals against the signatures stored in that
  * bucket's state. A doc flagged in ANY band is a candidate; the per-doc
  * verdict is the OR over its bands (resolved per micro-batch downstream,
  * e.g. in `foreachBatch`, keeping the query to one stateful operator).
  *
  * Scale posture: state is per-BUCKET, sharded by the same hash shuffle as
  * any keyed op — hot buckets shard no worse than hot keys in any streaming
  * aggregation. Each bucket stores at most [[maxBucket]] signatures (FIFO
  * eviction) and idle buckets are GC'd by a processing-time timeout, so
  * state is bounded regardless of stream length — the standard trade of
  * bounded state for bounded-recall dedup on unbounded input.
  */
object StreamDedup {

  /** A doc arriving on the stream. */
  final case class DocEvent(docId: Long, text: String)

  /** Band-level candidate verdict: `dupOf` = earliest admitted doc in this
    * bucket whose signature estimates Jaccard ≥ threshold. */
  final case class BandVerdict(docId: Long, band: Int, dupOf: Option[Long])

  /** Per-bucket state: admitted (docId, signature) pairs, insertion order. */
  final case class BucketState(entries: List[(Long, Array[Long])])

  val BucketIdleTimeoutMs: Long = 3600 * 1000L

  /** Estimated Jaccard from KM-MinHash signatures: fraction of agreeing
    * components (the unbiased MinHash estimator). */
  private def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var agree = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) agree += 1; i += 1 }
    agree.toDouble / a.length
  }

  def transition(threshold: Double, maxBucket: Int)(
      key: String,
      events: Iterator[(String, Long, Int, Array[Long])],
      state: GroupState[BucketState]): Iterator[BandVerdict] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var entries = state.getOption.map(_.entries).getOrElse(Nil)
    val out = scala.collection.mutable.ArrayBuffer.empty[BandVerdict]
    // deterministic intra-batch order: docId (arrival order within a
    // micro-batch is not defined by Spark)
    events.toSeq.sortBy(_._2).foreach { case (_, docId, band, sig) =>
      val hit = entries.reverseIterator // earliest admitted first
        .find { case (_, s) => estJaccard(sig, s) >= threshold }
      out += BandVerdict(docId, band, hit.map(_._1))
      if (hit.isEmpty) {
        entries = (docId, sig) :: entries
        if (entries.length > maxBucket) entries = entries.take(maxBucket)
      }
    }
    state.update(BucketState(entries))
    state.setTimeoutDuration(BucketIdleTimeoutMs)
    out.iterator
  }

  /** Wire the operator: doc stream → per-band verdicts. `threshold` is on
    * the signature-estimated Jaccard; bands/rows mirror the batch q35
    * parameters so candidates match the batch pipeline's. */
  def bandVerdicts(docs: Dataset[DocEvent], threshold: Double = 0.5,
                   maxBucket: Int = 1024)
                  (implicit spark: SparkSession): Dataset[BandVerdict] = {
    import spark.implicits._
    val sigs = docs.toDF()
      .select(col("docId"), T.minhashSigUdf(3, 8)(col("text")).as("sig"))
      .filter(col("sig").isNotNull)
    val banded = sigs
      .select(col("docId"), col("sig"),
        explode(T.bandKeys(col("sig"), 4, 2)).as("bk"))
      .select(col("bk.bkey").as("bkey"), col("docId"),
        col("bk.band").as("band"), col("sig"))
      .as[(String, Long, Int, Array[Long])]
    banded
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout())(
        transition(threshold, maxBucket))
  }

  /** Per-doc resolution for one micro-batch of band verdicts: a doc is a
    * duplicate iff any band flagged it; ties resolve to the smallest
    * flagged source (deterministic). Run inside `foreachBatch`. */
  def resolve(verdicts: Dataset[BandVerdict]): Dataset[(Long, Option[Long])] = {
    import verdicts.sparkSession.implicits._
    verdicts.toDF()
      .groupBy(col("docId"))
      .agg(min(col("dupOf")).as("dupOf"))
      .as[(Long, Option[Long])]
  }
}
