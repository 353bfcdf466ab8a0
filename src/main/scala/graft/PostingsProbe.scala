package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the posting-table artifact (operators/Retrieval): at
  * an inflated corpus, measure (a) the artifact build, (b) a stored
  * probe — which must read only the phrase terms' buckets — against the
  * brute single-scan phraseSearch over the same corpus, and (c) an
  * exactly-once append plus the post-append probe. Before any timing,
  * stored results must equal the brute results row-for-row.
  *
  * Usage: runMain graft.PostingsProbe [sfDir] [mult] [nBuckets]
  */
object PostingsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(64)
    val nBuckets = args.lift(2).map(_.toInt).getOrElse(256)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Retrieval

    val phrase = Seq("join", "part", "filter")
    val base = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    def copy(i: Int): DataFrame =
      base.withColumn("doc_id", col("doc_id") + lit(i * 1000000000L))
    val corpus = (0 until mult).map(copy).reduce(_ union _).cache()
    println(s"docs=${corpus.count()} (${mult}x) nBuckets=$nBuckets")

    val dir = s"/tmp/graft_postings_probe_$mult"
    def timed(tag: String)(body: => Long): Long = {
      val t0 = System.nanoTime()
      val n = body
      println(f"POSTINGS $tag%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
      n
    }

    timed("build") { Retrieval.writePostings(corpus, dir, nBuckets); 0L }
    // correctness gate before timing: stored ≡ brute on the full corpus
    val brute0 = Retrieval.phraseSearch(corpus, phrase)
      .collect().map(_.toSeq).toSet
    val stored0 = Retrieval.phraseSearchStored(spark, dir, phrase)
      .collect().map(_.toSeq).toSet
    require(brute0 == stored0, s"stored probe diverged: " +
      s"extra=${(stored0 -- brute0).take(2)} missing=${(brute0 -- stored0).take(2)}")
    println(s"forms agree on ${brute0.size} matching docs")

    for (_ <- 1 to 2) {
      timed("brute_scan") {
        Retrieval.phraseSearch(corpus, phrase).collect().length.toLong }
      timed("stored_probe") {
        Retrieval.phraseSearchStored(spark, dir, phrase)
          .collect().length.toLong }
    }
    // bucket-pruning bound: the probe's partition filter admits at most
    // one bucket per distinct phrase term (the exact ids are the same
    // xxhash64 pmod the probe itself computes)
    println(f"probe reads <= ${phrase.distinct.size} of $nBuckets " +
      f"bucket dirs (${100.0 * phrase.distinct.size / nBuckets}%.1f%%)")

    val extra = base.withColumn("doc_id", col("doc_id") + lit(900000000000L))
    timed("append_1slice") {
      Retrieval.appendPostings(extra, dir, "probe-append"); 0L }
    timed("probe_post_append") {
      Retrieval.phraseSearchStored(spark, dir, phrase)
        .collect().length.toLong }

    // (d) tombstoned upsert: re-post the appended slice with edited
    // text — the probe must serve ONLY the new rows, and the tombstone
    // join must stay priced by the delete delta, not the corpus
    // (compare probe_post_upsert against probe_post_append above)
    val edited = extra.withColumn("text",
      concat(col("text"), lit(" probeeditmark")))
    timed("upsert_slice") {
      Retrieval.upsertPostings(edited, dir, "probe-upsert"); 0L }
    timed("probe_post_upsert") {
      Retrieval.phraseSearchStored(spark, dir, phrase)
        .collect().length.toLong }
    val logical = corpus.union(edited)
    val bruteU = Retrieval.phraseSearch(logical, phrase)
      .collect().map(_.toSeq).toSet
    val storedU = Retrieval.phraseSearchStored(spark, dir, phrase)
      .collect().map(_.toSeq).toSet
    require(bruteU == storedU, s"post-upsert probe diverged: " +
      s"extra=${(storedU -- bruteU).take(2)} missing=${(bruteU -- storedU).take(2)}")
    println(s"post-upsert forms agree on ${bruteU.size} matching docs")

    // (e) rebuild under an in-flight reader: the superseded generation's
    // one-cycle grace must hold at scale — the old reader resolved its
    // file listing pre-flip and drains intact while fresh probes see the
    // new generation
    val oldReader = Retrieval.phraseSearchStored(spark, dir, phrase)
    timed("rebuild_gen") { Retrieval.writePostings(corpus, dir, nBuckets); 0L }
    timed("old_reader_drain") { oldReader.collect().length.toLong }
    timed("fresh_probe") {
      Retrieval.phraseSearchStored(spark, dir, phrase)
        .collect().length.toLong }
    timed("expire_gens") {
      Retrieval.expirePostingsGenerations(spark, dir).toLong }
    corpus.unpersist()
    spark.stop()
  }
}
