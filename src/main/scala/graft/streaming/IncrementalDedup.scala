package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * DELTA PUBLISHING (the write-side 100 TB posture): a version is either
  * a FULL snapshot (`_FULL` marker file) or a DELTA — upserts for the
  * keys the batch changed plus `removed = true` tombstones. Per-batch
  * write cost is therefore O(batch + affected members), matching the
  * compute cost, instead of rewriting the O(corpus) state three times
  * per batch. Readers fold newest-full + later deltas with a
  * latest-version-wins window per key (the merge-on-read shape). Every
  * `compactEvery` deltas the maintainer writes a fresh FULL snapshot and
  * GC keeps the two newest fulls plus everything after the older one —
  * exactly the chain any replayed batch needs.
  *
  * Append batch: new docs' band keys probe the bucket table (equijoin);
  * the matched cluster labels identify the affected components; ONLY
  * their members (semi-join on label) plus the new docs enter the star
  * CC over star edges ∪ (new→bucket-label) edges ∪ new-new bucket
  * cliques. Unaffected clusters — the overwhelming majority of a 100 TB
  * corpus — are never read into the subgraph and never rewritten. A new
  * doc BRIDGING two stored clusters merges them correctly: both labels
  * are affected, so both member sets are pulled in and relabeled to the
  * joint minimum.
  *
  * Deletion batch (rows with `op = "del"`; takedowns/retractions): the
  * deleted docs' components are the affected set. Their SURVIVING
  * members' band keys are pulled from `bands`, each bucket re-linked
  * member→bucket-min (star per bucket — connectivity-equivalent to the
  * clique without df² pairs), and the star CC re-run on that real
  * subgraph — so a component correctly SPLITS when the deleted doc was
  * its only bridge. Affected buckets are rebuilt from surviving bands (a
  * bucket whose members are all deleted tombstones away). Within one
  * batch, deletions apply BEFORE appends.
  *
  * Exactly-once: batch N reads the newest chain < N and publishes `v=N`
  * by rename — replays re-derive the same delta (or the same full, for
  * compaction batches: the trigger depends only on the prior chain).
  * The invariant spec pins the folded labels ==
  * [[TextOps.clusterAssignments]] (the batch recompute) over the
  * surviving corpus after EVERY batch, including splits and compactions.
  */
object IncrementalDedup {

  private def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.drop(2).toLong)
  }

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def isFull(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(dir, "_FULL"))

  /** The version chain a reader at `upTo` folds: newest full ≤ newest
    * version < upTo, plus every later delta (ascending). */
  private def chain(spark: SparkSession, kindDir: String,
      upTo: Long): Seq[Long] = {
    val vs = versions(spark, kindDir).filter(_ < upTo).sorted
    val lastFull = vs.lastIndexWhere(v => isFull(spark, s"$kindDir/v=$v"))
    if (lastFull < 0) vs else vs.drop(lastFull)
  }

  /** Merge-on-read: latest version wins per key; tombstones drop keys.
    * Every stored row carries `removed` (always false in fulls).
    * Folded as an ASCENDING chain of anti-join + union — each delta's
    * keys knock out older rows — rather than a latest-wins window: the
    * window would shuffle the whole state per read, while the anti-joins
    * broadcast whenever the delta is small (AQE's call), keeping the base
    * a map-side scan. Chain length is bounded by compactEvery. */
  private def readFolded(spark: SparkSession, kindDir: String, upTo: Long,
      keyCols: Seq[String]): Option[DataFrame] = {
    val vs = chain(spark, kindDir, upTo)
    if (vs.isEmpty) None
    else {
      val parts = vs.map(v => spark.read.parquet(s"$kindDir/v=$v"))
      val folded = parts.reduce { (acc, d) =>
        acc.join(d.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(d)
      }
      Some(folded.filter(!col("removed")).drop("removed"))
    }
  }

  /** Newest published (doc_id, cluster) assignment, or None pre-stream. */
  def currentLabels(spark: SparkSession, stateDir: String): Option[DataFrame] =
    readFolded(spark, s"$stateDir/labels", Long.MaxValue, Seq("node"))
      .map(_.select(col("node").as("doc_id"), col("label").as("cluster")))

  /** Merge one micro-batch of (doc_id, text[, op]) rows, idempotent in
    * batchId. Without an `op` column every row is an append; with one,
    * rows are `"add"` or `"del"` (del needs only doc_id). Adding a LIVE
    * doc_id is an UPDATE: its old presence (including its old band keys)
    * is retracted first, so the maintained clusters always reflect every
    * doc's current text. Contract: at most one op per doc_id per batch —
    * two adds of the same id with different texts in one batch have no
    * well-defined cluster (the property spec generates under this
    * contract; upstream the usual fix is a latest-wins dedup before the
    * sink, q81's CDC compaction). */
  def mergeBatch(docs: DataFrame, batchId: Long, stateDir: String,
                 compactEvery: Int = 8): Unit = {
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

    def readBase(kind: String, keys: Seq[String]): Option[DataFrame] =
      readFolded(spark, s"$stateDir/$kind", batchId, keys)
    val storedLabels = readBase("labels", Seq("node"))
      .getOrElse(spark.emptyDataFrame.withColumn("node", lit(0L))
        .withColumn("label", lit(0L)).limit(0)
        .select(col("node"), col("label")))
    val storedBuckets = readBase("buckets", Seq("band", "bkey"))
      .getOrElse(newBands.limit(0)
        .select(col("band"), col("bkey"), col("doc_id").as("label")))
    val storedBands = readBase("bands", Seq("doc_id", "band", "bkey"))
      .getOrElse(newBands.limit(0)
        .select(col("doc_id"), col("band"), col("bkey")))

    // ---- deletion phase: retractions can split components ----
    // Each output pairs the post-delete base (for the append phase) with
    // the batch's delta rows (for publishing).
    //
    // RE-INGESTED ids route through here too: adding a LIVE doc_id with
    // (possibly) different text must retract its OLD band keys first —
    // otherwise the stale keys stay in `bands` and a later deletion in
    // the component would reconnect clusters through text the doc no
    // longer has. Delete-then-add makes the maintained labels equal the
    // recompute over every doc's CURRENT text, which is the invariant.
    val reIngested = newDocs.select(col("doc_id"))
      .join(storedLabels.select(col("node").as("st_node")),
        col("doc_id") === col("st_node"), "left_semi")
    val delIdsAll = dels.unionByName(reIngested).distinct()
    val emptyDelta = (df: DataFrame) =>
      df.limit(0).withColumn("removed", lit(false))
    val anyDeletes = hasOp || !delIdsAll.isEmpty
    val (baseLabels, baseBuckets, baseBands,
         delLabelDelta, delBucketDelta, delBandDelta) = if (!anyDeletes) {
      (storedLabels, storedBuckets, storedBands,
        emptyDelta(storedLabels), emptyDelta(storedBuckets),
        emptyDelta(storedBands))
    } else {
      // Renamed unresolved join keys throughout: the deletion frames all
      // share lineage (delSet with the batch, the empty-state defaults
      // with newBands), and dataset-qualified refs on shared lineage trip
      // DetectAmbiguousSelfJoin.
      val delIds = delIdsAll.select(col("doc_id").as("del_id"))
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
      // the deleted nodes that actually existed (tombstone set)
      val deadNodes = storedLabels
        .join(delIds, col("node") === col("del_id"), "left_semi")
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
      val deadBands = storedBands
        .join(delIds, col("doc_id") === col("del_id"), "left_semi")
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
      // bucket keys of affected components that did NOT survive the rebuild
      val deadBuckets = storedBuckets
        .join(delAffected, col("label") === col("dlabel"), "left_semi")
        .select(col("band"), col("bkey"))
        .join(rebuiltB.select(col("band"), col("bkey")),
          Seq("band", "bkey"), "left_anti")
        .withColumn("label", lit(0L))
      val bucketsD = keptB.unionByName(rebuiltB)
        .groupBy(col("band"), col("bkey")).agg(min(col("label")).as("label"))
      // materialize AND mint fresh attribute ids: labelsD/bucketsD/bandsD
      // interleave the same source attributes, which the append phase's
      // joins would otherwise see as ambiguous self-joins
      def fresh(df: DataFrame): DataFrame = {
        val ck = df.localCheckpoint()
        spark.createDataFrame(ck.rdd, ck.schema)
      }
      // deltas: survivor relabels (upserts) + node tombstones; rebuilt
      // bucket upserts + vanished-bucket tombstones; band-row tombstones
      (fresh(labelsD), fresh(bucketsD), fresh(bandsD),
        fresh(survLabels.withColumn("removed", lit(false))
          .unionByName(deadNodes.withColumn("label", lit(0L))
            .withColumn("removed", lit(true)))),
        fresh(rebuiltB.withColumn("removed", lit(false))
          .unionByName(deadBuckets.withColumn("removed", lit(true)))),
        fresh(deadBands.withColumn("removed", lit(true))))
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
    // 5. every new doc gets a label (subgraph result, else itself).
    //    Re-ingested ids were retracted in the deletion phase, so the
    //    post-delete base never contains a doc being added here — its
    //    label is purely a function of its CURRENT text.
    val newLabels = newDocs.select(col("doc_id").as("node"))
      .join(sub, Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("label"))
    // 6. the batch's label delta: relabeled affected members + new docs
    //    (carried clusters are never rewritten — that is the point)
    val labelDelta = sub.join(baseLabels.select(col("node")),
        Seq("node"), "left_semi")
      .unionByName(newLabels)
      .groupBy(col("node")).agg(min(col("label")).as("label"))
      .withColumn("removed", lit(false))
    // 7. bucket delta: matched buckets take their component's NEW label
    //    (the old label is itself a node in the subgraph); new docs'
    //    buckets are added with their final label. Kept buckets cannot
    //    collide with new-doc buckets (a collision would make the bucket
    //    matched, hence affected), so the delta alone is the final value.
    val relabeled = storedOrBase(baseBuckets, affected)
      .join(sub.withColumnRenamed("label", "nl"),
        col("label") === col("node"))
      .select(col("band"), col("bkey"), col("nl").as("label"))
    val newBuckets = newBands
      .join(newLabels.select(col("node"), col("label")),
        col("doc_id") === col("node"))
      .select(col("band"), col("bkey"), col("label"))
    val bucketDelta = relabeled.unionByName(newBuckets)
      .groupBy(col("band"), col("bkey")).agg(min(col("label")).as("label"))
      .withColumn("removed", lit(false))
    // 8. band delta: the new docs' keys
    val bandDelta = newBands.withColumn("removed", lit(false))

    // combine with the deletion-phase deltas; the append phase wins on
    // key overlap (it ran second), expressed as a phase-priority window
    def combined(delPhase: DataFrame, addPhase: DataFrame,
        keys: Seq[String]): DataFrame = {
      val u = delPhase.withColumn("_p", lit(0))
        .unionByName(addPhase.withColumn("_p", lit(1)))
      val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_p").desc)
      u.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_p", "_rn")
    }
    val labelsOutDelta = combined(delLabelDelta, labelDelta, Seq("node"))
    val bucketsOutDelta = combined(delBucketDelta, bucketDelta,
      Seq("band", "bkey"))
    val bandsOutDelta = combined(delBandDelta, bandDelta,
      Seq("doc_id", "band", "bkey"))

    // compaction decision is a pure function of the prior chain, so
    // replays of the same batch make the same choice
    def wantFull(kind: String): Boolean =
      chain(spark, s"$stateDir/$kind", batchId).length >= compactEvery ||
        versions(spark, s"$stateDir/$kind").forall(_ >= batchId)
    def fullOf(kind: String): DataFrame = kind match {
      // the final folded state, as a full snapshot (removed = false)
      case "labels" =>
        baseLabels.join(labelsOutDelta.filter(!col("removed"))
            .select(col("node")), Seq("node"), "left_anti")
          .join(delLabelDelta.filter(col("removed")).select(col("node")),
            Seq("node"), "left_anti")
          .unionByName(labelsOutDelta.filter(!col("removed"))
            .drop("removed"))
          .withColumn("removed", lit(false))
      case "buckets" =>
        baseBuckets.join(bucketsOutDelta.select(col("band"), col("bkey")),
            Seq("band", "bkey"), "left_anti")
          .unionByName(bucketsOutDelta.filter(!col("removed"))
            .drop("removed"))
          .withColumn("removed", lit(false))
      case _ =>
        baseBands.join(bandsOutDelta.select(col("doc_id"), col("band"),
              col("bkey")), Seq("doc_id", "band", "bkey"), "left_anti")
          .unionByName(bandsOutDelta.filter(!col("removed"))
            .drop("removed"))
          .withColumn("removed", lit(false))
    }

    def publish(kind: String, delta: DataFrame): Unit = {
      val full = wantFull(kind)
      val df = if (full) fullOf(kind) else delta
      val tmp = s"$stateDir/$kind/.tmp_v_$batchId"
      val dest = s"$stateDir/$kind/v=$batchId"
      df.write.mode("overwrite").parquet(tmp)
      val hfs = fs(spark, stateDir)
      if (full) hfs.createNewFile(new Path(tmp, "_FULL"))
      val destPath = new Path(dest)
      if (hfs.exists(destPath)) hfs.delete(destPath, true)
      hfs.rename(new Path(tmp), destPath)
      // GC: keep the two newest fulls and everything after the older one
      // (any replayed batch ≥ the older full can still fold its chain)
      val vs = versions(spark, s"$stateDir/$kind").sorted
      val fulls = vs.filter(v => isFull(spark, s"$stateDir/$kind/v=$v"))
      if (fulls.length >= 2) {
        val keepFrom = fulls(fulls.length - 2)
        vs.filter(_ < keepFrom).foreach(v =>
          hfs.delete(new Path(s"$stateDir/$kind/v=$v"), true))
      }
    }
    publish("labels", labelsOutDelta)
    publish("buckets", bucketsOutDelta)
    publish("bands", bandsOutDelta)
    matched.unpersist()
    newBands.unpersist()
    newDocs.unpersist()
  }

  /** Affected (semi-join) slice of the bucket table. */
  private def storedOrBase(baseBuckets: DataFrame,
      affected: DataFrame): DataFrame =
    baseBuckets.join(affected,
      baseBuckets("label") === affected("label"), "left_semi")

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
