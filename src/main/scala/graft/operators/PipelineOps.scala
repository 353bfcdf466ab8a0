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
    // Domain/source temperature resampling (the Pile / DoReMi-style
    // source reweighting): flatten the source distribution toward
    // uniform with temperature 2 — target share ∝ sqrt(tokens) — by
    // computing a per-source keep-rate anchored so the SMALLEST source
    // keeps 100%: rate_d = sqrt(S_min / S_d). Every per-doc decision is
    // a deterministic md5 threshold (reproducible shards, no RNG state).
    // Exactness: the only float ops are one division, one sqrt, one
    // multiply — each IEEE-754 correctly-rounded, so DuckDB reproduces
    // the integer threshold bit-for-bit; all outputs are integers.
    // Scale: pass 1 reduces the corpus to one (tokens, docs) row per
    // source; the tiny rate table is BROADCAST back for the map-side
    // keep decision (a real pipeline persists pass 1's stats — the
    // two scans here are the standard stats+apply shape, never a
    // corpus-sized shuffle or collect).
    "q99_domain_reweight" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(T.tokens(col("text"))).cast("long").as("ntok"))
      val stats = tok.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("s_tok"))
      val rates = stats
        .crossJoin(broadcast(stats.agg(min(col("s_tok")).as("s_min"))))
        .withColumn("thr",
          floor(sqrt(col("s_min").cast("double") / col("s_tok").cast("double"))
            * 1000000d).cast("long"))
        .select(col("source"), col("n_docs"), col("s_tok"), col("thr"))
      tok.join(broadcast(rates), Seq("source"))
        .withColumn("keep",
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 1000000L < col("thr"))
        .groupBy(col("source"))
        .agg(first(col("n_docs")).as("n_docs"),
          first(col("s_tok")).as("tok_total"),
          first(col("thr")).as("thr"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("keep"), col("ntok")).otherwise(0L)).as("kept_tokens"))
        .orderBy(col("source"))
    }),

    "q98_curation_funnel" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val normE = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      // The dedup window partitions by md5(norm), NOT norm itself: the
      // normalized document body never crosses the shuffle — only a
      // 32-char digest does (at 100 TB the difference between shuffling
      // the corpus and shuffling ~3% of it). DuckDB's md5 is identical,
      // so the oracle mirrors the hashed key exactly; is_sampled reuses
      // the same digest, saving the second md5 pass.
      // (Tables.spread measured NET-NEGATIVE here: it would repartition
      // the full text upfront, while the hashed dedup key below means no
      // document bytes ever need to shuffle at all.)
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), normE.as("norm"))
        .withColumn("ntok", size(T.tokens(col("norm"))).cast("long"))
        .withColumn("pass_len", col("ntok").between(5, 500))
        .select(col("doc_id"), col("lang"), md5(col("norm")).as("nh"),
          col("pass_len"))
      val w = Window.partitionBy(col("lang"), col("nh"), col("pass_len"))
        .orderBy(col("doc_id"))
      t.withColumn("rn", row_number().over(w))
        .withColumn("is_rep", col("pass_len") && col("rn") === 1)
        .withColumn("is_sampled", col("is_rep") &&
          conv(substring(col("nh"), 1, 8), 16, 10).cast("long")
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

    "q99_domain_reweight" ->
      s"""WITH tok AS (
           SELECT doc_id, source, len($duckTokens) AS ntok FROM documents),
         st AS (
           SELECT source, count(*) AS n_docs,
             CAST(sum(ntok) AS BIGINT) AS s_tok
           FROM tok GROUP BY source),
         mn AS (SELECT min(s_tok) AS s_min FROM st),
         r AS (
           SELECT source, n_docs, s_tok,
             CAST(floor(sqrt(CAST(s_min AS DOUBLE) / CAST(s_tok AS DOUBLE))
               * 1000000) AS BIGINT) AS thr
           FROM st, mn),
         k AS (
           SELECT t.source, t.ntok, r.n_docs, r.s_tok, r.thr,
             (('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 1000000 < r.thr) AS keep
           FROM tok t JOIN r USING (source))
         SELECT source, any_value(n_docs) AS n_docs,
           any_value(s_tok) AS tok_total, any_value(thr) AS thr,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN keep THEN ntok ELSE 0 END) AS BIGINT)
             AS kept_tokens
         FROM k GROUP BY source ORDER BY source""",

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
           SELECT lang, md5(norm) AS nh, doc_id,
             (ntok BETWEEN 5 AND 500) AS pass_len,
             row_number() OVER (
               PARTITION BY lang, md5(norm), (ntok BETWEEN 5 AND 500)
               ORDER BY doc_id) AS rn
           FROM t)
         SELECT lang, count(*) AS n_in,
           CAST(sum(CASE WHEN pass_len THEN 1 ELSE 0 END) AS BIGINT)
             AS n_len,
           CAST(sum(CASE WHEN pass_len AND rn = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dedup,
           CAST(sum(CASE WHEN pass_len AND rn = 1
             AND ('0x' || substr(nh, 1, 8))::BIGINT % 100 < 80
             THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
         FROM st GROUP BY lang ORDER BY lang""")
}
