package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.{TextFns => T}
import graft.operators.TextOps

/** Incremental near-dup CLUSTERING — q58's cluster assignment maintained
  * under streaming appends AND deletions, the way [[ViewMaintenance]]
  * maintains q97 and [[SketchMaintenance]] maintains q61. A full
  * recompute of connected components per arriving batch would rescan the
  * entire corpus; this operator touches only the AFFECTED subgraph.
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
  *  - `bands`: (doc_id, band, bkey) — every live doc's band keys. The
  *    collapsed bucket index is enough for appends (connectivity only
  *    ever GROWS), but a deletion can SPLIT a component, and deciding
  *    the split needs the surviving members' real co-bucket edges —
  *    which only the per-doc band keys can reconstruct. Slim 3-column
  *    rows, O(docs × bands); the honest price of retraction support.
  *
  * Append batch: new docs' band keys probe the bucket table (equijoin);
  * the matched cluster labels identify the affected components; ONLY
  * their members (semi-join on label) plus the new docs enter the star
  * CC over star edges ∪ (new→bucket-label) edges ∪ new-new bucket
  * cliques. Unaffected clusters — the overwhelming majority of a 100 TB
  * corpus — are carried over untouched (anti-join). A new doc BRIDGING
  * two stored clusters merges them correctly: both labels are affected,
  * so both member sets are pulled in and relabeled to the joint minimum.
  * Cost per batch: O(new docs + affected members), not O(corpus).
  *
  * Deletion batch (rows with `op = "del"`; takedowns/retractions,
  * api-analog: a mailbox purge): the deleted docs' components are the
  * affected set. Their SURVIVING members' band keys are pulled from
  * `bands`, each bucket re-linked member→bucket-min (star per bucket —
  * connectivity-equivalent to the clique without df² pairs), and the
  * star CC re-run on that real subgraph — so a component correctly
  * SPLITS when the deleted doc was its only bridge. Unaffected clusters
  * carry over by anti-join; affected buckets are rebuilt from surviving
  * bands (a bucket whose members are all deleted vanishes). Cost:
  * O(affected members + their bands), not O(corpus). Within one batch,
  * deletions apply BEFORE appends (re-adding a just-deleted id in the
  * same batch leaves it live).
  *
  * Exactly-once: batch N reads the newest version < N and publishes
  * `v=N` by rename — replays re-derive the same result
  * ([[ViewMaintenance]]'s journal pattern, HDFS-atomicity caveat there).
  * The invariant spec pins labels == [[TextOps.clusterAssignments]]
  * (the batch recompute) over the surviving corpus after EVERY batch,
  * including batches that split clusters.
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

  /** Merge one micro-batch of (doc_id, text[, op]) rows, idempotent in
    * batchId. Without an `op` column every row is an append; with one,
    * rows are `"add"` or `"del"` (del needs only doc_id). */
  def mergeBatch(docs: DataFrame, batchId: Long, stateDir: String,
                 retainVersions: Int = 3): Unit = {
    val spark = docs.sparkSession
    val hasOp = docs.columns.contains("op")
    val adds = if (hasOp) docs.filter(col("op") === "add") else docs
    val dels =
      if (hasOp) docs.filter(col("op") === "del").select(col("doc_id")).distinct()
      else docs.select(col("doc_id")).limit(0)
    val newDocs = adds.select(col("doc_id"), col("text")).persist()
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
    val storedLabels = readBase("labels")
      .getOrElse(spark.emptyDataFrame.withColumn("node", lit(0L))
        .withColumn("label", lit(0L)).limit(0)
        .select(col("node"), col("label")))
    val storedBuckets = readBase("buckets")
      .getOrElse(newBands.limit(0)
        .select(col("band"), col("bkey"), col("doc_id").as("label")))
    val storedBands = readBase("bands")
      .getOrElse(newBands.limit(0)
        .select(col("doc_id"), col("band"), col("bkey")))

    // ---- deletion phase: retractions can split components ----
    val (baseLabels, baseBuckets, baseBands) = if (!hasOp) {
      (storedLabels, storedBuckets, storedBands)
    } else {
      // Renamed unresolved join keys throughout: the deletion frames all
      // share lineage (delSet with the batch, the empty-state defaults
      // with newBands), and dataset-qualified refs on shared lineage trip
      // DetectAmbiguousSelfJoin.
      val delIds = dels.select(col("doc_id").as("del_id"))
        .localCheckpoint() // tiny; cut lineage, reused 3×
      // components that lose a member
      val delAffected = storedLabels
        .join(delIds, col("node") === col("del_id"), "left_semi")
        .select(col("label").as("dlabel")).distinct().localCheckpoint()
      // their surviving members
      val survivors = storedLabels
        .join(delAffected, col("label") === col("dlabel"), "left_semi")
        .join(delIds, col("node") === col("del_id"), "left_anti")
        .select(col("node"))
      // real co-bucket edges among survivors, from the per-doc band keys:
      // within each bucket connect member → bucket minimum (star, not df²)
      val survBands = storedBands
        .join(survivors.select(col("node").as("surv_node")),
          col("doc_id") === col("surv_node"), "left_semi")
        .localCheckpoint()
      val bucketRep = survBands.groupBy(col("band"), col("bkey"))
        .agg(min(col("doc_id")).as("rep"))
      val delEdges = survBands.join(bucketRep, Seq("band", "bkey"))
        .filter(col("doc_id") =!= col("rep"))
        .select(col("doc_id").as("a"), col("rep").as("b"))
      val recomputed = TextOps.minLabelPropagate(delEdges)
      val survLabels = survivors
        .join(recomputed, Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("node")).as("label"))
        .localCheckpoint()
      val labelsD = storedLabels
        .join(delAffected, col("label") === col("dlabel"), "left_anti")
        .select(col("node"), col("label"))
        .unionByName(survLabels)
      // bands: drop the deleted docs' rows
      val bandsD = storedBands
        .join(delIds, col("doc_id") === col("del_id"), "left_anti")
      // buckets: unaffected carry over; affected rebuilt from surviving
      // bands + split labels (all-deleted buckets disappear)
      val keptB = storedBuckets
        .join(delAffected, col("label") === col("dlabel"), "left_anti")
        .select(col("band"), col("bkey"), col("label"))
      val rebuiltB = survBands
        .join(survLabels.select(col("node").as("sl_node"),
            col("label").as("sl_label")),
          col("doc_id") === col("sl_node"))
        .groupBy(col("band"), col("bkey")).agg(min(col("sl_label")).as("label"))
      val bucketsD = keptB.unionByName(rebuiltB)
        .groupBy(col("band"), col("bkey")).agg(min(col("label")).as("label"))
      // materialize AND mint fresh attribute ids: labelsD/bucketsD/bandsD
      // interleave the same source attributes, which the append phase's
      // joins would otherwise see as ambiguous self-joins
      def fresh(df: DataFrame): DataFrame = {
        val ck = df.localCheckpoint()
        spark.createDataFrame(ck.rdd, ck.schema)
      }
      (fresh(labelsD), fresh(bucketsD), fresh(bandsD))
    }

    // ---- append phase (unchanged logic, against the post-delete base) ----
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
    // 7. bands: post-delete base plus the new docs' keys
    val bandsOut = baseBands.unionByName(newBands)

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
    publish("bands", bandsOut)
    matched.unpersist()
    newBands.unpersist()
    newDocs.unpersist()
  }

  /** Wire a stream of (doc_id, text[, op]) rows into the maintained
    * clusters. */
  def maintain(docs: DataFrame, stateDir: String,
               checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        mergeBatch(batch.toDF(), batchId, stateDir)
      }
      .start()
}
