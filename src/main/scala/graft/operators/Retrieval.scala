package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Positional-postings phrase search (SURVEY.md §2.11 extension).
  *
  * The retrieval primitive the text stack lacked: exact phrase match
  * ("these k tokens, consecutively") over a tokenized corpus. BM25 (q89)
  * ranks bags of words; decontamination (q53) gates on n-gram overlap;
  * neither can answer "which documents contain THIS exact phrase, and
  * where" — the query every eval-leak audit and quote-tracing pass runs.
  *
  * Shape: ONE pass over the postings — never k self-joins of the corpus.
  * Each posting row (doc, pos, term) joins the BROADCAST phrase table
  * (term, idx) — the join both filters (terms outside the phrase drop;
  * at 100 TB this is the partition-pruned read of a persisted posting
  * table, the same artifact discipline as the IVF index) and tags each
  * hit with every phrase slot its term fills (a phrase with repeated
  * terms tags one posting several times — correct, they anchor different
  * candidate starts). A candidate start is `anchor = pos - idx`; a true
  * match is an anchor covered by ALL k slots. Since (doc, pos) is unique,
  * (doc, anchor, idx) is unique, so `count(*) = k` per (doc, anchor) is
  * exactly "all k slots present" — no distinct needed. Both groupBys
  * partial-aggregate map-side; nothing wider than the tagged hits (≈ the
  * phrase terms' posting lists) ever shuffles.
  *
  * Tokenization: whitespace split, empties dropped, positions indexed in
  * the FILTERED token stream — identical on the oracle side
  * (`list_filter(string_split(...))` + pairwise unnest).
  */
object Retrieval {

  /** Positional postings (doc_id, pos, term) — pos is the 0-based index
    * in the empty-filtered whitespace token stream, LongType. */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(filter(split(col("text"), " "), w => w =!= lit(""))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("term"))

  /** Docs containing `phrase` as consecutive tokens: one row per matching
    * doc with the occurrence count and first match position. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "Retrieval: empty phrase")
    require(phrase.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"Retrieval: phrase tokens must be non-empty and whitespace-free, " +
        s"got ${phrase.mkString("[", ", ", "]")}")
    val spark = docs.sparkSession
    import spark.implicits._
    val k = phrase.length
    val slots = phrase.zipWithIndex.map { case (t, i) => (t, i.toLong) }
      .toDF("term", "idx")
    postings(docs)
      .join(broadcast(slots), "term")
      .select(col("doc_id"), (col("pos") - col("idx")).as("anchor"))
      .groupBy(col("doc_id"), col("anchor"))
      .agg(count(lit(1)).as("n_slots"))
      .filter(col("n_slots") === lit(k.toLong))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("anchor")).as("first_pos"))
  }

  // ─── persisted posting-table artifact ───

  private val MetaName = "_graft_postings_nbuckets"

  /** Persist the postings as a term-hash-bucketed parquet artifact: the
    * production home of phrase search at 100 TB — built once, probed by
    * every query, and a probe READS ONLY its phrase terms' buckets
    * (partition pruning on `bucket=` dirs; the IVF-index discipline
    * applied to text). Layout: `base/bucket=N/` for the build,
    * `appends/<tag>/bucket=N/` per committed [[appendPostings]] batch.
    * `repartitionByRange(bucket, term)` keeps each layout at
    * ~nBuckets + tasks part-files instead of nBuckets × tasks (the q12b
    * index-layout lesson). The bucket count travels WITH the artifact
    * (meta sidecar written last, so its presence is the
    * write-completeness marker) — a probe can never silently prune with
    * the wrong modulus. Compaction = rebuild: `writePostings` from the
    * source corpus resets the artifact (and clears stale appends),
    * which is the honest batch answer while the append count stays a
    * bounded driver listing. */
  def writePostings(docs: DataFrame, dir: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0 && nBuckets <= (1 << 20),
      s"Retrieval: bad nBuckets $nBuckets")
    val s = docs.sparkSession
    val root = new org.apache.hadoop.fs.Path(dir)
    val hfs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    // a full rebuild owns the whole artifact: stale appends from a prior
    // build must not haunt the new base
    if (hfs.exists(root)) hfs.delete(root, true)
    bucketedPostings(docs, nBuckets)
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/base")
    val out = hfs.create(new org.apache.hadoop.fs.Path(dir, MetaName), true)
    try out.write(nBuckets.toString.getBytes("UTF-8")) finally out.close()
  }

  private def bucketedPostings(docs: DataFrame, nBuckets: Int): DataFrame =
    postings(docs)
      .withColumn("bucket",
        pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
      .repartitionByRange(col("bucket"), col("term"))

  private def readNBuckets(s: SparkSession, dir: String): Int = {
    val meta = new org.apache.hadoop.fs.Path(dir, MetaName)
    val hfs = meta.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(hfs.exists(meta),
      s"Retrieval: no complete postings artifact at $dir (missing " +
        s"$MetaName — build one with writePostings)")
    val in = hfs.open(meta)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
    finally in.close()
  }

  /** Exactly-once append of `docs`' postings to a written artifact:
    * stage under a hidden tmp dir, publish by ONE atomic rename to
    * `appends/<tag>/` — the tag dir's existence IS the committed marker,
    * so a replayed attempt (driver retry, workflow re-run) skips instead
    * of double-counting (returns false). The rename's return value is
    * enforced (HDFS-style filesystems report failure by returning false,
    * not throwing); torn tmp debris from a crashed attempt is cleared on
    * retry. Caller contract: a tag names ONE batch of docs, and appended
    * doc_ids are new (re-posting an existing doc duplicates its rows —
    * rebuild with writePostings to reset). */
  def appendPostings(docs: DataFrame, dir: String, tag: String): Boolean = {
    require(tag.nonEmpty && tag.matches("[A-Za-z0-9_\\-]+"),
      s"Retrieval: append tag must be [A-Za-z0-9_-]+, got `$tag`")
    val s = docs.sparkSession
    val nBuckets = readNBuckets(s, dir)
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val committed = new org.apache.hadoop.fs.Path(dir, s"appends/$tag")
    if (hfs.exists(committed)) return false // replay: already published
    val tmp = new org.apache.hadoop.fs.Path(dir, s".append_tmp_$tag")
    if (hfs.exists(tmp)) hfs.delete(tmp, true) // torn-attempt debris
    bucketedPostings(docs, nBuckets)
      .write.mode("overwrite").partitionBy("bucket").parquet(tmp.toString)
    hfs.mkdirs(committed.getParent)
    require(hfs.rename(tmp, committed),
      s"Retrieval: atomic publish rename failed for append `$tag` at " +
        s"$dir — the ledger contract (existence = completeness) would " +
        "be violated by continuing")
    true
  }

  /** [[phraseSearch]] against a written postings artifact: reads only
    * the buckets the phrase's terms hash to (≤ k of nBuckets — every
    * scan carries partition filters, spec-pinned) across the base layout
    * plus every COMMITTED append, then runs the same broadcast-slot
    * anchor aggregation. The appends listing is a driver directory list
    * bounded by the append count, never data. */
  def phraseSearchStored(spark: SparkSession, dir: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "Retrieval: empty phrase")
    require(phrase.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"Retrieval: phrase tokens must be non-empty and whitespace-free, " +
        s"got ${phrase.mkString("[", ", ", "]")}")
    import spark.implicits._
    val nBuckets = readNBuckets(spark, dir)
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val k = phrase.length
    val slots = phrase.zipWithIndex.map { case (t, i) => (t, i.toLong) }
      .toDF("term", "idx")
      .withColumn("bucket",
        pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
    // bounded collect: ≤ k bucket ids — becomes the partition filter
    val buckets = slots.select(col("bucket")).distinct()
      .as[Long].collect().toSeq
    // explicit schema so an empty append (no files at all) reads as an
    // empty relation instead of failing schema inference
    val postingSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("term",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.LongType)))
    val appendsRoot = new org.apache.hadoop.fs.Path(dir, "appends")
    val appendDirs =
      if (hfs.exists(appendsRoot))
        hfs.listStatus(appendsRoot).filter(_.isDirectory)
          .map(_.getPath.toString).toSeq.sorted
      else Seq.empty[String]
    (s"$dir/base" +: appendDirs)
      .map(p => spark.read.schema(postingSchema).parquet(p))
      .reduce(_ unionByName _)
      .filter(col("bucket").isin(buckets: _*))
      .join(broadcast(slots), Seq("term", "bucket"))
      .select(col("doc_id"), (col("pos") - col("idx")).as("anchor"))
      .groupBy(col("doc_id"), col("anchor"))
      .agg(count(lit(1)).as("n_slots"))
      .filter(col("n_slots") === lit(k.toLong))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("anchor")).as("first_pos"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact-phrase audit over the corpus: a trigram phrase present at
    // every test SF (sf0.001/0.01/0.1 alike; the multi-occurrence law is
    // pinned by RetrievalSpec's micro corpus). Oracle = the naive k-way
    // positional self-join — the SEMANTIC spec of "consecutive tokens";
    // the operator's single-scan anchor aggregation must reproduce it
    // exactly.
    "q121_phrase_search" -> ((s, d) =>
      phraseSearch(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        Seq("query", "big", "part"))
        .orderBy(col("doc_id"))),

    // The stored-artifact path: build the bucketed posting table, then
    // probe it — the probe's scan reads only the 3 terms' buckets of 64
    // (partition filters, pinned by RetrievalSpec). Same result law as
    // q121; the artifact is invisible in the output, so the oracle is
    // the same naive positional join on a second all-SF phrase.
    "q123_phrase_stored" -> ((s, d) => {
      val dir = s"/tmp/graft_postings_${new java.io.File(d).getName}"
      writePostings(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        dir, nBuckets = 64)
      phraseSearchStored(s, dir, Seq("join", "part", "filter"))
        .orderBy(col("doc_id"))
    }))

  def oracle: Map[String, String] = Map(
    "q121_phrase_search" ->
      """WITH d AS (
           SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w <> '') AS ws
           FROM documents),
         toks AS (
           SELECT doc_id, unnest(ws) AS term,
             CAST(unnest(range(len(ws))) AS BIGINT) AS pos
           FROM d)
         SELECT t0.doc_id, count(*) AS n_hits, min(t0.pos) AS first_pos
         FROM toks t0
         JOIN toks t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
         JOIN toks t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2
         WHERE t0.term = 'query' AND t1.term = 'big' AND t2.term = 'part'
         GROUP BY t0.doc_id ORDER BY t0.doc_id""",

    "q123_phrase_stored" ->
      """WITH d AS (
           SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w <> '') AS ws
           FROM documents),
         toks AS (
           SELECT doc_id, unnest(ws) AS term,
             CAST(unnest(range(len(ws))) AS BIGINT) AS pos
           FROM d)
         SELECT t0.doc_id, count(*) AS n_hits, min(t0.pos) AS first_pos
         FROM toks t0
         JOIN toks t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
         JOIN toks t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2
         WHERE t0.term = 'join' AND t1.term = 'part' AND t2.term = 'filter'
         GROUP BY t0.doc_id ORDER BY t0.doc_id""")
}
