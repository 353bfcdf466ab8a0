package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.functions.{TextFns => T}

/** Corpus-quality and curation operators over `documents` (round 5):
  * diversity scoring, sorted-neighborhood fuzzy dedup, and URL/domain
  * profiling — three more passes from the standard LLM-training-data
  * pipeline (SURVEY.md §2.11 extensions).
  *
  * Determinism notes: the diversity index is Gini-Simpson computed from
  * INTEGER term frequencies (one exact division at the end — both engines
  * round the same IEEE quotient), deliberately chosen over Shannon entropy
  * whose log() calls would tie the oracle to libm rounding. Levenshtein is
  * the classic DP edit distance — integer, engine-exact — and is computed
  * on an 80-char prefix so the per-pair cost is bounded regardless of
  * document length.
  */
object Quality {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token-diversity (Gini-Simpson) quality signal: 1 - Σtf²/n² per doc.
    // Low diversity = repetitive/templated text (the same signal Gopher's
    // repetition filters target, in one number). Two shuffles on
    // (doc_id, word) then doc_id, both with map-side combine.
    "q78_token_diversity" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(T.tokens(col("text"))).as("word"))
        .groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("tf"))
      tf.groupBy(col("doc_id"))
        .agg(sum(col("tf")).cast("long").as("n_tokens"),
          count(lit(1)).as("n_unique"),
          sum(col("tf") * col("tf")).cast("long").as("sum_sq"))
        .withColumn("simpson",
          lit(1.0) - col("sum_sq").cast("double") /
            (col("n_tokens") * col("n_tokens")).cast("double"))
        .select(col("doc_id"), col("n_tokens"), col("n_unique"),
          col("simpson"))
        .orderBy(col("doc_id"))
    }),

    // Sorted-neighborhood fuzzy dedup (Hernández-Stolfo SNM): sort the
    // corpus by content, compare each doc to its immediate neighbor with
    // a bounded edit distance. Complements LSH (q35/q48): SNM catches
    // small in-place edits that change many shingles, and costs ONE
    // window pass instead of a self-join. The window partitions by lang,
    // so at scale each partition sorts locally after one hash exchange —
    // no global sort. Neighbor pairs with lev(80-char prefix) <= 20 are
    // flagged.
    "q79_fuzzy_neighbors" -> ((s, d) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("text"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"))
        .withColumn("prev_id", lag(col("doc_id"), 1).over(w))
        .withColumn("prev_text", lag(col("text"), 1).over(w))
        .filter(col("prev_id").isNotNull)
        .withColumn("lev80",
          levenshtein(substring(col("text"), 1, 80),
            substring(col("prev_text"), 1, 80)).cast("long"))
        .select(col("lang"), col("doc_id"), col("prev_id"), col("lev80"),
          (col("lev80") <= 20).as("near_dup"))
        .orderBy(col("lang"), col("doc_id"), col("prev_id"))
    }),

    // URL/domain profiling: every web-scraped corpus carries a source URL
    // whose host distribution drives per-domain quality policy. The
    // synthetic corpus has no URL column, so a deterministic URL is
    // planted per doc (same device as q64's planted PII), then parsed
    // with Spark's parse_url (HOST + QUERY param) — the oracle reproduces
    // the parse with regexes. Map-only + one host-keyed aggregate.
    "q80_url_domains" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("url", concat(lit("https://www.site"),
          pmod(col("doc_id"), lit(40)).cast("string"),
          lit(".example.com/p/"), col("doc_id").cast("string"),
          lit("?ref="), col("source")))
        .select(col("doc_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref"))
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("first_doc"),
          countDistinct(col("ref")).as("n_refs"))
        .orderBy(col("host"))
    }),

    // Vocabulary-growth (Heaps' law) profile: cumulative distinct-word
    // count vs cumulative token count, checkpointed every 50 docs. The
    // heavy lifting is distributed (per-word first-occurrence = one
    // groupBy; per-block token totals = one groupBy); only the final
    // cumulative window runs over the BLOCK table, whose size is
    // corpus/50 — pick the block granularity so that table stays small
    // (a 100 TB corpus profiles in blocks of millions of docs, keeping
    // the single-partition cumulative window a few thousand rows).
    "q84_vocab_growth" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(T.tokens(col("text"))).as("word"))
      val newWords = tok.groupBy(col("word"))
        .agg(min(col("doc_id")).as("first_doc"))
        .groupBy(floor(col("first_doc") / 50).cast("long").as("block"))
        .agg(count(lit(1)).as("new_words"))
      val blockTokens = tok
        .groupBy(floor(col("doc_id") / 50).cast("long").as("block"))
        .agg(count(lit(1)).as("block_tokens"))
      val cum = Window.orderBy(col("block"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      newWords.join(blockTokens, Seq("block"), "full")
        .select(col("block"),
          coalesce(col("new_words"), lit(0L)).as("nw"),
          coalesce(col("block_tokens"), lit(0L)).as("bt"))
        .select(col("block"),
          sum(col("nw")).over(cum).cast("long").as("vocab_size"),
          sum(col("bt")).over(cum).cast("long").as("total_tokens"))
        .orderBy(col("block"))
    }),

    // Inverted-index keyword search: rank documents by total term
    // frequency over a query term set — the retrieval shape (explode →
    // term filter → per-doc aggregate → global top-k) that backs corpus
    // search/decontamination lookups. The term filter prunes the exploded
    // stream BEFORE the shuffle, and the ranking is integer (tf, doc_id)
    // so the top-k cut is engine-exact.
    "q85_keyword_search" -> ((s, d) => {
      val terms = Seq("spark", "window", "join")
      Tables.documents(s, d)
        .select(col("doc_id"), explode(T.tokens(col("text"))).as("word"))
        .filter(col("word").isin(terms: _*))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("total_tf"),
          countDistinct(col("word")).as("n_terms"))
        .withColumn("all_terms", col("n_terms") === terms.size)
        .orderBy(col("total_tf").desc, col("doc_id"))
        .limit(20)
    }),

    // BM25 ranked retrieval (round 5): the scoring layer over q85's
    // inverted-index shape — Okapi BM25 (k1=1.2, b=0.75) for a fixed
    // 3-term query. Corpus stats (N, avgdl, per-term df) are 1-row /
    // 3-row aggregates that broadcast onto the per-doc term frequencies;
    // the candidate set is only docs containing >= 1 query term (the
    // explode is term-filtered BEFORE its shuffle), so the big table is
    // scanned once and the scoring join is candidate-sized. The per-doc
    // score sums the three per-term contributions in FIXED textual order
    // (no float aggregation). Scores are transcendental (ln), so the
    // oracle compares the RANKING only (rank, doc_id, integer tf) — the
    // q41/q42 convention; measured score margins are far above any
    // cross-engine libm ulp.
    "q89_bm25_rank" -> ((s, d) => {
      val terms = Seq("spark", "window", "join")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), T.tokens(col("text")).as("ws"))
        .select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
          col("ws"))
      val stats = docs.agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("ws")).as("word"))
        .filter(col("word").isin(terms: _*))
        .groupBy(col("doc_id"), col("dl"))
        .agg(sum(when(col("word") === terms.head, 1L).otherwise(0L))
            .as(s"tf_${terms.head}"),
          terms.tail.map(t => sum(when(col("word") === t, 1L).otherwise(0L))
            .as(s"tf_$t")): _*)
      val dfAggs = terms.map(t =>
        sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
      val df_ = tf.agg(dfAggs.head, dfAggs.tail: _*)
      // constants written as the same literals the oracle SQL uses
      // (k1=1.2, b=0.75 → 1-b=0.25, k1+1=2.2), so both engines round the
      // identical decimal strings to the identical doubles
      def contrib(t: String) = {
        val idf = log((col("n_docs").cast("double") - col(s"df_$t") + 0.5) /
          (col(s"df_$t") + lit(0.5)))
        val norm = col(s"tf_$t").cast("double") +
          lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl"))
        when(col(s"tf_$t") > 0,
          idf * (col(s"tf_$t").cast("double") * lit(2.2)) / norm)
          .otherwise(lit(0.0))
      }
      val scored = tf.crossJoin(broadcast(stats)).crossJoin(broadcast(df_))
        .withColumn("score",
          contrib("spark") + contrib("window") + contrib("join"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(15)
      scored.withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
            .cast("long"))
        .select(col("rank"), col("doc_id"),
          (col("tf_spark") + col("tf_window") + col("tf_join"))
            .as("total_tf"))
        .orderBy(col("rank"))
    }),

    // PMI collocations (round 5): adjacent-bigram association strength —
    // the phrase-mining pass (new-token discovery, tokenizer audits) over
    // the corpus. Counts are pure integers; the "positively associated"
    // test pmi > 0 ⟺ c_xy·Nu² > c_x·c_y·Nb is evaluated by EXACT
    // cross-multiplication in 128-bit-capable arithmetic (Spark
    // DECIMAL(38,0), DuckDB HUGEINT) — no log() ever happens, so the
    // boolean is engine-exact at any corpus size whose products fit 38
    // digits (~1e13 tokens, i.e. beyond 100 TB of text).
    "q92_pmi_collocations" -> ((s, d) => {
      val ws = Tables.documents(s, d).select(T.tokens(col("text")).as("ws"))
      val bigrams = ws.select(explode(when(size(col("ws")) >= 2,
          transform(sequence(lit(0), size(col("ws")) - 2),
            i => struct(element_at(col("ws"), i + 1).as("x"),
              element_at(col("ws"), i + 2).as("y"))))
          .otherwise(array())).as("bg"))
        .select(col("bg.x"), col("bg.y"))
      val cxy = bigrams.groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("c_xy"))
      val uni = ws.select(explode(col("ws")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
      val totals = cxy.agg(sum(col("c_xy")).cast("long").as("nb"))
        .crossJoin(uni.agg(sum(col("c_w")).cast("long").as("nu")))
      def d38(c: org.apache.spark.sql.Column) =
        c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
      cxy
        .join(uni.withColumnRenamed("w", "x").withColumnRenamed("c_w", "c_x"), "x")
        .join(uni.withColumnRenamed("w", "y").withColumnRenamed("c_w", "c_y"), "y")
        .crossJoin(broadcast(totals))
        .withColumn("assoc",
          d38(col("c_xy")) * d38(col("nu")) * d38(col("nu")) >
            d38(col("c_x")) * d38(col("c_y")) * d38(col("nb")))
        .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
          col("assoc"))
        .orderBy(col("c_xy").desc, col("x"), col("y"))
        .limit(20)
    }))

  private val duckTokens = "list_filter(string_split(text, ' '), w -> w <> '')"

  def oracle: Map[String, String] = Map(
    "q78_token_diversity" ->
      s"""WITH tf AS (
           SELECT doc_id, word, count(*) AS tf FROM (
             SELECT doc_id, unnest($duckTokens) AS word FROM documents) t
           GROUP BY doc_id, word),
         agg AS (
           SELECT doc_id, sum(tf) AS n_tokens, count(*) AS n_unique,
             sum(tf * tf) AS sum_sq
           FROM tf GROUP BY doc_id)
         SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, n_unique,
           1.0 - CAST(sum_sq AS DOUBLE) /
             CAST(n_tokens * n_tokens AS DOUBLE) AS simpson
         FROM agg ORDER BY doc_id""",

    "q79_fuzzy_neighbors" ->
      """WITH w AS (
           SELECT doc_id, lang, text,
             lag(doc_id) OVER (PARTITION BY lang ORDER BY text, doc_id)
               AS prev_id,
             lag(text) OVER (PARTITION BY lang ORDER BY text, doc_id)
               AS prev_text
           FROM documents)
         SELECT lang, doc_id, prev_id,
           CAST(levenshtein(substring(text, 1, 80),
             substring(prev_text, 1, 80)) AS BIGINT) AS lev80,
           levenshtein(substring(text, 1, 80),
             substring(prev_text, 1, 80)) <= 20 AS near_dup
         FROM w WHERE prev_id IS NOT NULL
         ORDER BY lang, doc_id, prev_id""",

    "q80_url_domains" ->
      """WITH u AS (
           SELECT doc_id,
             'https://www.site' || CAST(doc_id % 40 AS VARCHAR)
               || '.example.com/p/' || CAST(doc_id AS VARCHAR)
               || '?ref=' || source AS url,
             source
           FROM documents)
         SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           count(*) AS n_docs, min(doc_id) AS first_doc,
           count(DISTINCT regexp_extract(url, '[?]ref=(.*)$', 1)) AS n_refs
         FROM u GROUP BY 1 ORDER BY 1""",

    "q84_vocab_growth" ->
      s"""WITH tok AS (
           SELECT doc_id, unnest($duckTokens) AS word FROM documents),
         nw AS (
           SELECT CAST(floor(first_doc / 50) AS BIGINT) AS block,
             count(*) AS new_words
           FROM (SELECT word, min(doc_id) AS first_doc FROM tok
                 GROUP BY word) f
           GROUP BY 1),
         bt AS (
           SELECT CAST(floor(doc_id / 50) AS BIGINT) AS block,
             count(*) AS block_tokens
           FROM tok GROUP BY 1),
         m AS (
           SELECT COALESCE(nw.block, bt.block) AS block,
             COALESCE(new_words, 0) AS nw,
             COALESCE(block_tokens, 0) AS bt
           FROM nw FULL JOIN bt ON nw.block = bt.block)
         SELECT block,
           CAST(sum(nw) OVER (ORDER BY block
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS vocab_size,
           CAST(sum(bt) OVER (ORDER BY block
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS total_tokens
         FROM m ORDER BY block""",

    "q85_keyword_search" ->
      s"""SELECT doc_id, count(*) AS total_tf,
           count(DISTINCT word) AS n_terms,
           count(DISTINCT word) = 3 AS all_terms
         FROM (SELECT doc_id, unnest($duckTokens) AS word FROM documents) t
         WHERE word IN ('spark', 'window', 'join')
         GROUP BY doc_id
         ORDER BY total_tf DESC, doc_id LIMIT 20""",

    // ln() ties the score to libm, so only the integer ranking is
    // compared (the q41/q42 convention); constants appear as the same
    // decimal literals the Spark side uses.
    "q89_bm25_rank" ->
      s"""WITH d AS (
           SELECT doc_id, len($duckTokens) AS dl, $duckTokens AS ws
           FROM documents),
         stats AS (
           SELECT count(*) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM d),
         tf AS (
           SELECT doc_id, dl,
             CAST(sum(CASE WHEN word = 'spark' THEN 1 ELSE 0 END) AS BIGINT)
               AS tf_spark,
             CAST(sum(CASE WHEN word = 'window' THEN 1 ELSE 0 END) AS BIGINT)
               AS tf_window,
             CAST(sum(CASE WHEN word = 'join' THEN 1 ELSE 0 END) AS BIGINT)
               AS tf_join
           FROM (SELECT doc_id, dl, unnest(ws) AS word FROM d) u
           WHERE word IN ('spark', 'window', 'join')
           GROUP BY doc_id, dl),
         dfs AS (
           SELECT CAST(sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_spark,
             CAST(sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_window,
             CAST(sum(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_join
           FROM tf),
         scored AS (
           SELECT doc_id,
             tf_spark + tf_window + tf_join AS total_tf,
             (CASE WHEN tf_spark > 0 THEN
               ln((CAST(n_docs AS DOUBLE) - df_spark + 0.5) / (df_spark + 0.5))
               * (CAST(tf_spark AS DOUBLE) * 2.2)
               / (CAST(tf_spark AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
              ELSE 0.0 END)
             + (CASE WHEN tf_window > 0 THEN
               ln((CAST(n_docs AS DOUBLE) - df_window + 0.5) / (df_window + 0.5))
               * (CAST(tf_window AS DOUBLE) * 2.2)
               / (CAST(tf_window AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
              ELSE 0.0 END)
             + (CASE WHEN tf_join > 0 THEN
               ln((CAST(n_docs AS DOUBLE) - df_join + 0.5) / (df_join + 0.5))
               * (CAST(tf_join AS DOUBLE) * 2.2)
               / (CAST(tf_join AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
              ELSE 0.0 END) AS score
           FROM tf, stats, dfs)
         SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
             AS rank,
           doc_id, total_tf
         FROM scored ORDER BY score DESC, doc_id LIMIT 15""",

    "q92_pmi_collocations" ->
      s"""WITH t AS (SELECT $duckTokens AS ws FROM documents),
         pos AS (
           SELECT unnest(generate_series(1, len(ws) - 1)) AS i, ws FROM t),
         bg AS (SELECT ws[i] AS x, ws[i + 1] AS y FROM pos),
         cxy AS (SELECT x, y, count(*) AS c_xy FROM bg GROUP BY x, y),
         uni AS (SELECT w, count(*) AS c_w FROM (
           SELECT unnest(ws) AS w FROM t) u GROUP BY w),
         tot AS (SELECT
           (SELECT CAST(sum(c_xy) AS BIGINT) FROM cxy) AS nb,
           (SELECT CAST(sum(c_w) AS BIGINT) FROM uni) AS nu)
         SELECT c.x, c.y, c.c_xy, ux.c_w AS c_x, uy.c_w AS c_y,
           CAST(c.c_xy AS HUGEINT) * nu * nu >
             CAST(ux.c_w AS HUGEINT) * uy.c_w * nb AS assoc
         FROM cxy c
         JOIN uni ux ON c.x = ux.w
         JOIN uni uy ON c.y = uy.w, tot
         ORDER BY c.c_xy DESC, c.x, c.y LIMIT 20""")
}
