package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.{TextFns => T}
import graft.operators.TextOps

/** Incremental near-dup CLUSTERING — q58's cluster assignment maintained
  * under streaming appends, the way [[ViewMaintenance]] maintains q97 and
  * [[SketchMaintenance]] maintains q61. A full recompute of connected
  * components per arriving batch would rescan the entire corpus; this
  * operator touches only the AFFECTED subgraph.
  *
  * Stored state (batchId-versioned like the other maintainers):
  *  - `labels`:  (node, label) — every doc's cluster label (= component
  *    minimum doc_id), path-compressed: each node points DIRECTLY at its
  *    label, so stored components are stars of diameter ≤ 2.
  *  - `buckets`: (band, bkey, label) — ONE row per distinct LSH bucket
  *    with the bucket's cluster label. Sound because q58's candidate rule
  *    makes every bucket a clique: all stored members of a bucket are
  *    already in one component, so linking a new doc to the bucket's
  *    LABEL is connectivity-equivalent to linking it to every member.
  *
  * Per batch: new docs' band keys probe the bucket table (equijoin); the
  * matched cluster labels identify the affected components; ONLY their
  * members (semi-join on label) plus the new docs enter a min-label
  * propagation over star edges ∪ (new→bucket-label) edges ∪ new-new
  * bucket cliques. Unaffected clusters — the overwhelming majority of a
  * 100 TB corpus — are carried over untouched (anti-join). A new doc
  * BRIDGING two stored clusters merges them correctly: both labels are
  * affected, so both member sets are pulled in and relabeled to the
  * joint minimum. Cost per batch: O(new docs + affected members), not
  * O(corpus).
  *
  * Exactly-once: batch N reads the newest version < N and publishes
  * `v=N` by rename — replays re-derive the same result
  * ([[ViewMaintenance]]'s journal pattern, HDFS-atomicity caveat there).
  * The invariant spec pins labels == [[TextOps.clusterAssignments]]
  * (the batch recompute) over the prefix corpus after EVERY batch.
  */
object IncrementalDedup {

  private def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.drop(2).toLong)
  }

  /** Newest published (doc_id, cluster) assignment, or None pre-stream. */
  def currentLabels(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val vs = versions(spark, s"$stateDir/labels")
    if (vs.isEmpty) None
    else Some(spark.read.parquet(s"$stateDir/labels/v=${vs.max}")
      .select(col("node").as("doc_id"), col("label").as("cluster")))
  }

  /** Merge one micro-batch of (doc_id, text) rows, idempotent in batchId. */
  def mergeBatch(docs: DataFrame, batchId: Long, stateDir: String,
                 retainVersions: Int = 3): Unit = {
    val spark = docs.sparkSession
    val newDocs = docs.select(col("doc_id"), col("text")).persist()
    newDocs.count()
    val sig = newDocs
      .select(col("doc_id"), T.minhashSigUdf(3, 8)(col("text")).as("sig"))
      .filter(col("sig").isNotNull)
    val newBands = sig.select(col("doc_id"),
        explode(T.bandKeys(col("sig"), 4, 2)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.bkey").as("bkey"))
      .persist()
    newBands.count()

    def readBase(kind: String): Option[DataFrame] =
      versions(spark, s"$stateDir/$kind").filter(_ < batchId) match {
        case Nil => None
        case vs => Some(spark.read.parquet(s"$stateDir/$kind/v=${vs.max}"))
      }
    val baseLabels = readBase("labels")
      .getOrElse(spark.emptyDataFrame.withColumn("node", lit(0L))
        .withColumn("label", lit(0L)).limit(0)
        .select(col("node"), col("label")))
    val baseBuckets = readBase("buckets")
      .getOrElse(newBands.limit(0)
        .select(col("band"), col("bkey"), col("doc_id").as("label")))

    // 1. probe the stored bucket index with the new docs' band keys
    val matched = newBands.join(baseBuckets, Seq("band", "bkey"))
      .select(col("doc_id"), col("label"))
      .persist()
    matched.count()
    // 2. the affected components, and every one of their members
    val affected = matched.select(col("label")).distinct()
    val affectedMembers = baseLabels.join(affected, Seq("label"))
      .select(col("node"), col("label"))
    // 3. edge set for the subgraph: stored stars + new→bucket-label links
    //    + new-new bucket cliques, symmetrized
    val newNew = newBands.alias("x").join(newBands.alias("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    val halfEdges = affectedMembers.filter(col("node") =!= col("label"))
      .select(col("node").as("a"), col("label").as("b"))
      .unionByName(matched.select(col("doc_id").as("a"), col("label").as("b")))
      .unionByName(newNew)
      .distinct()
    val edges = halfEdges.select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .localCheckpoint()
    // 4. resolve the subgraph (tiny relative to the corpus)
    val sub = TextOps.minLabelPropagate(edges)
    // 5. every new doc gets a label (subgraph result, else itself);
    //    untouched stored clusters carry over via anti-join
    val newLabels = newDocs.select(col("doc_id").as("node"))
      .join(sub, Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("label"))
    val carried = baseLabels.join(affected,
        baseLabels("label") === affected("label"), "left_anti")
    val labelsOut = carried.unionByName(
        sub.join(baseLabels.select(col("node")), Seq("node"), "left_semi"))
      .unionByName(newLabels)
      .groupBy(col("node")).agg(min(col("label")).as("label"))
    // 6. bucket index: untouched rows carry over; matched buckets take
    //    their component's NEW label (the old label is itself a node in
    //    the subgraph); new docs' buckets are added with their final
    //    label; collapse to one row per bucket
    val keptBuckets = baseBuckets.join(affected,
        baseBuckets("label") === affected("label"), "left_anti")
    val relabeled = baseBuckets.join(affected,
        baseBuckets("label") === affected("label"), "left_semi")
      .join(sub.withColumnRenamed("label", "nl"),
        col("label") === col("node"))
      .select(col("band"), col("bkey"), col("nl").as("label"))
    val newBuckets = newBands
      .join(newLabels, col("doc_id") === col("node"))
      .select(col("band"), col("bkey"), col("label"))
    val bucketsOut = keptBuckets.unionByName(relabeled).unionByName(newBuckets)
      .groupBy(col("band"), col("bkey")).agg(min(col("label")).as("label"))

    def publish(kind: String, df: DataFrame): Unit = {
      val tmp = s"$stateDir/$kind/.tmp_v_$batchId"
      val dest = s"$stateDir/$kind/v=$batchId"
      df.write.mode("overwrite").parquet(tmp)
      val fs = new Path(stateDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val destPath = new Path(dest)
      if (fs.exists(destPath)) fs.delete(destPath, true)
      fs.rename(new Path(tmp), destPath)
      val keep = math.max(2, retainVersions)
      versions(spark, s"$stateDir/$kind").sorted.dropRight(keep)
        .foreach(v => fs.delete(new Path(s"$stateDir/$kind/v=$v"), true))
    }
    publish("labels", labelsOut)
    publish("buckets", bucketsOut)
    matched.unpersist()
    newBands.unpersist()
    newDocs.unpersist()
  }

  /** Wire a stream of (doc_id, text) rows into the maintained clusters. */
  def maintain(docs: DataFrame, stateDir: String,
               checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        mergeBatch(batch.toDF(), batchId, stateDir)
      }
      .start()
}
