package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.functions.{TextFns => T}

/** Training-data curation operators beyond per-doc text analysis
  * (SURVEY.md §2.11 extensions, round 2): repetition-based quality
  * signals, benchmark decontamination, sequence packing, and
  * deterministic stratified sampling — the steps an LLM data pipeline
  * runs between dedup and tokenization at 100 TB.
  *
  * Scale posture: repetition stats are map-only (one UDF pass per doc);
  * decontamination broadcasts the (small) eval-set n-gram table against a
  * map-side explode of the corpus — never a corpus×corpus join; packing
  * windows are PARTITIONED BY shard (a global ORDER BY would serialize
  * the pipeline — real packers work per shard/file and so does this one);
  * sampling is a stateless hash predicate pushed at the scan.
  */
object PipelineOps {

  /** Gopher-style repetition counters, one pass per document. */
  case class RepStats(n_words: Long, n_dist_words: Long,
                      n_2grams: Long, n_dist_2grams: Long)

  /** Single-pass repetition-stat UDF (duplicate word / duplicate 2-gram
    * counts): the HOF form would re-tokenize per derived column (lambda
    * scopes block subexpression elimination, cf. TextFns.shinglesUdf). */
  val repStatsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => {
      val ws = if (text == null) Array.empty[String]
        else text.split(" ").filter(_.nonEmpty)
      val grams = if (ws.length < 2) Array.empty[String]
        else ws.sliding(2).map(_.mkString(" ")).toArray
      RepStats(ws.length.toLong, ws.distinct.length.toLong,
        grams.length.toLong, grams.distinct.length.toLong)
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Repetition quality signals (the Gopher/MassiveText repetition
    // filters): duplicate-word and duplicate-2-gram fractions per doc,
    // with a keep/flag label. Map-only — no shuffle at any scale.
    "q52_repetition_stats" -> ((s, d) => {
      Tables.spread(Tables.documents(s, d))
        .withColumn("r", repStatsUdf(col("text")))
        .select(col("doc_id"),
          col("r.n_words").as("n_words"),
          // single division of exact integers → bit-identical doubles
          ((col("r.n_words") - col("r.n_dist_words")).cast("double") /
            col("r.n_words")).as("dup_word_ratio"),
          ((col("r.n_2grams") - col("r.n_dist_2grams")).cast("double") /
            col("r.n_2grams")).as("dup_2gram_ratio"))
        .withColumn("quality",
          when(col("dup_2gram_ratio") > 0.5, "repetitive").otherwise("ok"))
        .orderBy(col("doc_id"))
    }),

    // Benchmark decontamination (the n-gram overlap check run before
    // training): eval set = every 97th doc; a corpus doc is contaminated
    // if it shares any 4-gram with any eval doc (real pipelines use
    // 8-13-grams; with this corpus's 31-word vocabulary a 4-gram has the
    // same selectivity). The eval gram table is
    // tiny by construction (eval sets are), so it broadcasts; the corpus
    // side is a map-side explode — the classic asymmetric semi-join, no
    // corpus shuffle at all.
    "q53_decontaminate" -> ((s, d) => {
      val grams = Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"),
          explode(T.shinglesUdf(4)(col("text"))).as("gram"))
      val evalGrams = grams.filter(pmod(col("doc_id"), lit(97)) === 0)
        .select(col("gram")).distinct()
      grams.filter(pmod(col("doc_id"), lit(97)) =!= 0)
        .join(broadcast(evalGrams), "gram")
        // per-doc grams are already distinct (shinglesUdf), so count(*)
        // is the distinct shared-gram count
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared_grams"))
        .orderBy(col("doc_id"))
    }),

    // Sequence packing (concat-and-chunk): assign docs to fixed
    // token-budget training sequences by running token count, WITHIN a
    // shard — window PARTITION BY shard, never a global total order (that
    // is the one window shape that cannot scale; per-shard is what real
    // packers do since each output file packs independently).
    "q54_pack_sequences" -> ((s, d) => {
      val budget = 512
      val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(T.tokens(col("text"))).cast("long").as("n_tokens"),
          pmod(col("doc_id"), lit(8)).as("shard"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("seq_id", expr(s"(cum - n_tokens) DIV $budget"))
        .groupBy(col("shard"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("seq_tokens"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("shard"), col("seq_id"))
    }),

    // Deterministic stratified sampling for dataset mixing: per-language
    // keep rates applied via a content-stable hash bucket (md5 of the
    // doc id — reproducible across engines, partitionings, and reruns,
    // unlike rand()). A stateless predicate: evaluates at the scan, no
    // shuffle, and the same doc always lands on the same side.
    "q55_stratified_sample" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("bucket",
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 100)
        .withColumn("rate", when(col("lang") === "en", 50).otherwise(80))
        .filter(col("bucket") < col("rate"))
        .select(col("doc_id"), col("lang"), col("bucket"))
        .orderBy(col("doc_id"))
    }),

    // End-to-end curation funnel (round 5b): the composed pipeline every
    // pretraining corpus runs — normalize (q73's convention) → token-length
    // gate → exact dedup (first-doc-wins per normalized text) → md5-bucket
    // sampling (q55's convention) — reported as per-language attrition
    // counts. ONE scan computes every stage as a flag column (the dedup
    // rank is a window over (lang, norm, pass_len)), then one aggregate
    // folds the funnel; at 100 TB that is one exchange for the window and
    // one for the language rollup, with no stage rescanning the corpus.
    "q98_curation_funnel" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val normE = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), normE.as("norm"))
        .withColumn("ntok", size(T.tokens(col("norm"))).cast("long"))
        .withColumn("pass_len", col("ntok").between(5, 500))
      val w = Window.partitionBy(col("lang"), col("norm"), col("pass_len"))
        .orderBy(col("doc_id"))
      t.withColumn("rn", row_number().over(w))
        .withColumn("is_rep", col("pass_len") && col("rn") === 1)
        .withColumn("is_sampled", col("is_rep") &&
          conv(substring(md5(col("norm")), 1, 8), 16, 10).cast("long")
            % 100 < 80)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_in"),
          sum(when(col("pass_len"), 1L).otherwise(0L)).as("n_len"),
          sum(when(col("is_rep"), 1L).otherwise(0L)).as("n_dedup"),
          sum(when(col("is_sampled"), 1L).otherwise(0L)).as("n_sampled"))
        .orderBy(col("lang"))
    }))

  private val duckTokens = "list_filter(string_split(text, ' '), w -> w <> '')"
  // distinct 4-word shingles, mirroring TextFns.shinglesUdf(4)
  private def duck4grams(ws: String) =
    s"""CASE WHEN len($ws) >= 4 THEN list_distinct(list_transform(
       range(1, len($ws) - 2),
       i -> $ws[i] || ' ' || $ws[i+1] || ' ' || $ws[i+2] || ' ' ||
            $ws[i+3]))
       ELSE [] END"""

  def oracle: Map[String, String] = Map(
    "q52_repetition_stats" ->
      s"""WITH t AS (SELECT doc_id, $duckTokens AS ws FROM documents),
         g AS (SELECT doc_id, ws,
           CASE WHEN len(ws) >= 2 THEN list_transform(range(1, len(ws)),
             i -> ws[i] || ' ' || ws[i+1]) ELSE [] END AS g2 FROM t),
         m AS (SELECT doc_id,
           len(ws) AS n_words, len(list_distinct(ws)) AS n_dist_words,
           len(g2) AS n_2grams, len(list_distinct(g2)) AS n_dist_2grams
           FROM g)
         SELECT doc_id, n_words,
           CAST(n_words - n_dist_words AS DOUBLE) / n_words AS dup_word_ratio,
           CAST(n_2grams - n_dist_2grams AS DOUBLE) / n_2grams
             AS dup_2gram_ratio,
           CASE WHEN CAST(n_2grams - n_dist_2grams AS DOUBLE) / n_2grams > 0.5
             THEN 'repetitive' ELSE 'ok' END AS quality
         FROM m ORDER BY doc_id""",

    "q53_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $duckTokens AS ws FROM documents),
         g AS (SELECT doc_id, unnest(${duck4grams("ws")}) AS gram FROM t),
         eg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
         SELECT doc_id, count(*) AS n_shared_grams
         FROM g JOIN eg USING (gram)
         WHERE doc_id % 97 <> 0
         GROUP BY doc_id ORDER BY doc_id""",

    "q54_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, len($duckTokens) AS n_tokens,
           doc_id % 8 AS shard FROM documents),
         c AS (SELECT doc_id, shard, n_tokens,
           sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
             ROWS UNBOUNDED PRECEDING) AS cum FROM t)
         SELECT shard, CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
           min(doc_id) AS first_doc
         FROM c GROUP BY shard, seq_id ORDER BY shard, seq_id""",

    "q55_stratified_sample" ->
      """SELECT doc_id, lang,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
             AS bucket
         FROM documents
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
           < CASE WHEN lang = 'en' THEN 50 ELSE 80 END
         ORDER BY doc_id""",

    "q98_curation_funnel" ->
      """WITH n AS (
           SELECT doc_id, lang,
             trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
           FROM documents),
         t AS (
           SELECT doc_id, lang, norm,
             len(list_filter(string_split(norm, ' '), w -> w <> '')) AS ntok
           FROM n),
         st AS (
           SELECT lang, norm, doc_id,
             (ntok BETWEEN 5 AND 500) AS pass_len,
             row_number() OVER (
               PARTITION BY lang, norm, (ntok BETWEEN 5 AND 500)
               ORDER BY doc_id) AS rn
           FROM t)
         SELECT lang, count(*) AS n_in,
           CAST(sum(CASE WHEN pass_len THEN 1 ELSE 0 END) AS BIGINT)
             AS n_len,
           CAST(sum(CASE WHEN pass_len AND rn = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dedup,
           CAST(sum(CASE WHEN pass_len AND rn = 1
             AND ('0x' || substr(md5(norm), 1, 8))::BIGINT % 100 < 80
             THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
         FROM st GROUP BY lang ORDER BY lang""")
}
