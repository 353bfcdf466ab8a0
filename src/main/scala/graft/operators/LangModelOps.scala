package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** Trained language-model text operators (SURVEY.md §2.11 text analysis):
  * a char-n-gram language identifier that LEARNS per-language profiles
  * from labeled text (replacing q101's fixed marker lists as the
  * production-shaped path — markers only work when you already know the
  * languages' function words), and a true BPE tokenizer (merge loop, not
  * just the q50 pre-tokenizer) whose token counts are merge-table-exact.
  *
  * Both are engine-exact by construction (integer counts, deterministic
  * tie-breaks), so the full train→predict / merge→count pipelines are
  * reproduced by DuckDB oracles.
  */
object LangModelOps {

  // ─── char-n-gram language ID ───

  /** Char n-grams of `c` as an array column (empty when len < n).
    * The explicit `when` guard matters: Spark's `sequence(1, L-2)`
    * DESCENDS for L < 3 and would emit junk indices. */
  private def charNgrams(c: Column, n: Int): Column =
    when(length(c) >= n,
      transform(sequence(lit(1), length(c) - (n - 1)),
        i => c.substr(i, lit(n))))
      .otherwise(array())

  /** Train per-language char-trigram profiles from `train` (lang, text)
    * — top `topM` n-grams per language by (count DESC, gram ASC) — and
    * classify `docs` (doc_id, text) by counted profile overlap: score =
    * occurrences of profile grams in the doc, argmax by (score DESC,
    * lang DESC), `und` on zero overlap.
    *
    * Scale shape: the profile is topM×|langs| rows — broadcast; doc
    * n-gram extraction is a map-side generator; the score aggregation
    * partial-aggregates map-side into ≤|langs| rows per doc before the
    * shuffle. Training cost is one groupBy over the labeled corpus —
    * run once, reused across prediction batches (the profile DataFrame
    * is an argument, not recomputed per call). */
  def langIdTrained(docs: DataFrame, profiles: DataFrame): DataFrame = {
    val docTri = docs.select(col("doc_id"),
      explode(charNgrams(col("text"), 3)).as("g"))
    val scores = docTri.join(broadcast(profiles), "g")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("lang").desc)
    val best = scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("score"))
    docs.select(col("doc_id")).join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lang"), lit("und")).as("pred_lang"),
        coalesce(col("score"), lit(0L)).as("score"))
      .orderBy(col("doc_id"))
  }

  /** The training step of [[langIdTrained]]: (lang, g) profile rows. */
  def trainLangProfiles(train: DataFrame, topM: Int = 64): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("g"))
    train.select(col("lang"), explode(charNgrams(col("text"), 3)).as("g"))
      .groupBy(col("lang"), col("g")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topM)
      .select(col("lang"), col("g"))
  }

  /** Deterministic ASCII training corpus (6 sentences per language) —
    * the stand-in for a labeled training table; in production this is a
    * curated labeled dataset, here it must be VALUES-expressible so the
    * DuckDB oracle trains the identical model. */
  val langTrainRows: Seq[(String, String)] = Seq(
    ("en", "the quick brown fox jumps over the lazy dog"),
    ("en", "there is a house in the old town"),
    ("en", "what time is the meeting this evening"),
    ("en", "the weather was nice and the children played outside"),
    ("en", "this is the best thing that could happen"),
    ("en", "a strong wind blew through the trees"),
    ("de", "der schnelle braune fuchs springt ueber den faulen hund"),
    ("de", "es gibt ein haus in der alten stadt"),
    ("de", "wann ist das treffen heute abend"),
    ("de", "das wetter war schoen und die kinder spielten draussen"),
    ("de", "das ist das beste was passieren konnte"),
    ("de", "ein starker wind wehte durch die baeume"),
    ("fr", "le renard brun rapide saute par dessus le chien paresseux"),
    ("fr", "il y a une maison dans la vieille ville"),
    ("fr", "quelle heure est la reunion ce soir"),
    ("fr", "le temps etait beau et les enfants jouaient dehors"),
    ("fr", "c est la meilleure chose qui puisse arriver"),
    ("fr", "un vent fort soufflait dans les arbres"),
    ("es", "el rapido zorro marron salta sobre el perro perezoso"),
    ("es", "hay una casa en el casco antiguo de la ciudad"),
    ("es", "a que hora es la reunion esta tarde"),
    ("es", "el tiempo era bueno y los ninos jugaban fuera"),
    ("es", "es lo mejor que podia pasar"),
    ("es", "un viento fuerte soplaba entre los arboles"))

  /** Held-out test sentences (never in training): the model must route
    * each to its language by learned trigram overlap alone, plus a
    * no-overlap row that must fall back to `und`. */
  val langTestRows: Seq[(Long, String)] = Seq(
    (3000001L, "the children walked to the old school in the morning"),
    (3000002L, "die kinder gingen am morgen in die alte schule"),
    (3000003L, "les enfants marchaient vers la vieille ecole le matin"),
    (3000004L, "los ninos caminaban hacia la vieja escuela por la manana"),
    (3000005L, "zz qq xx"))

  // ─── trained quality classifier (q115) ───

  /** Whitespace tokens of lower-cased `c`, empties dropped (a leading
    * separator yields an empty first split element in both engines). */
  private def wsTokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => t =!= "")

  /** Labeled quality training table — the stand-in for a curated
    * labeled set (VALUES-expressible so the oracle trains the identical
    * model): `hi` rows are clean prose, `lo` rows are the junk classes
    * the heuristic gates (q32/q52) target — keyword spam, repetition,
    * boilerplate, symbol noise. */
  val qualityTrainRows: Seq[(String, String)] = Seq(
    ("hi", "the committee reviewed the proposal and published its findings"),
    ("hi", "researchers measured the effect of temperature on reaction rates"),
    ("hi", "the novel follows a family across three generations of change"),
    ("hi", "engineers designed the bridge to withstand seasonal flooding"),
    ("hi", "the report explains how local markets adapted to new policies"),
    ("hi", "students presented their analysis of the survey results"),
    ("hi", "the museum opened a new exhibit on early navigation tools"),
    ("hi", "farmers rotated their crops to preserve the soil quality"),
    ("lo", "click here buy now free free free limited offer click here"),
    ("lo", "win win win cash prize click subscribe now now now"),
    ("lo", "aaa bbb ccc aaa bbb ccc aaa bbb ccc aaa"),
    ("lo", "best deal best deal best price buy buy buy cheap cheap"),
    ("lo", "lorem ipsum dolor sit amet lorem ipsum dolor sit amet"),
    ("lo", "subscribe like share subscribe like share subscribe like"),
    ("lo", "xxx 000 $$$ !!! xxx 000 $$$ !!! xxx 000"),
    ("lo", "home home contact about home links home contact about home"))

  /** Held-out sentences (never in training): routing must come from the
    * LEARNED token weights alone. */
  val qualityTestRows: Seq[(Long, String)] = Seq(
    (4000001L, "the city council approved the plan after a public review"),
    (4000002L, "scientists published the results of the field measurements"),
    (4000003L, "free free click now buy buy subscribe win cash offer"),
    (4000004L, "deal deal cheap cheap buy now click here free prize"))

  /** Train the integer token weights: per training token, its
    * occurrence count in each class, plus the class token totals
    * (broadcast-bounded: |training vocabulary| rows + one totals row).
    * Returns (weights, totals). */
  def trainQualityWeights(train: DataFrame): (DataFrame, DataFrame) = {
    val tok = train.select(col("label"),
      explode(wsTokens(col("text"))).as("w"))
    val weights = tok.groupBy(col("w")).agg(
      sum(when(col("label") === "hi", 1L).otherwise(0L)).as("cnt_hi"),
      sum(when(col("label") === "lo", 1L).otherwise(0L)).as("cnt_lo"))
    val totals = tok.agg(
      sum(when(col("label") === "hi", 1L).otherwise(0L)).as("t_hi"),
      sum(when(col("label") === "lo", 1L).otherwise(0L)).as("t_lo"))
    (weights, totals)
  }

  /** Trained quality classifier (q115) — the learned counterpart of the
    * q32/q52 heuristic gates, closing the curation stack's
    * heuristic→learned story. Multinomial class-frequency scoring in
    * EXACT INTEGERS: a doc's class score is Σ_w count_w(doc) ·
    * cnt_class(w), compared CROSS-MULTIPLIED by the opposite class's
    * token total (s_hi = raw_hi·t_lo vs s_lo = raw_lo·t_hi — the
    * integer form of comparing class-normalized frequencies
    * raw_hi/t_hi vs raw_lo/t_lo), so training, scoring, and the argmax
    * are all integer-exact and the DuckDB oracle retrains the identical
    * model. Ties — including zero-evidence docs — route to `lo` (the
    * conservative curation default: unknown text does not pass a
    * quality gate). Bounded-float-free by construction: no logs, no
    * smoothing constants to round.
    *
    * Scale shape: the weight table is |training vocab| rows —
    * broadcast; doc tokenization is a map-side generator; the score
    * aggregation partial-aggregates map-side into one row per doc
    * before the shuffle. Train once, classify any corpus. */
  def qualityClassify(docs: DataFrame, weights: DataFrame,
      totals: DataFrame): DataFrame = {
    val dtok = docs.select(col("doc_id"),
      explode(wsTokens(col("text"))).as("w"))
    val raw = dtok.join(broadcast(weights), "w")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt_hi")).as("raw_hi"), sum(col("cnt_lo")).as("raw_lo"))
    docs.select(col("doc_id")).join(raw, Seq("doc_id"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("s_hi", coalesce(col("raw_hi"), lit(0L)) * col("t_lo"))
      .withColumn("s_lo", coalesce(col("raw_lo"), lit(0L)) * col("t_hi"))
      .select(col("doc_id"),
        when(col("s_hi") > col("s_lo"), lit("hi")).otherwise(lit("lo"))
          .as("pred_label"),
        col("s_hi").cast("long").as("s_hi"),
        col("s_lo").cast("long").as("s_lo"))
      .orderBy(col("doc_id"))
  }

  // ─── LM fluency scoring (q119) ───

  /** Corpus-trained char-trigram LM fluency score — the engine's
    * CCNet-style perplexity gate. Real perplexity filtering scores each
    * document's negative log-likelihood under an n-gram LM and drops the
    * worst tail; floating-point `ln` is not reproducible across engines,
    * so this scorer QUANTIZES the log-probability to integer frequency
    * bits: each trigram contributes `floor(log2(corpus count))` (the
    * bin-length trick the q75 histogram uses), a doc's fluency is the
    * bit-sum normalized per trigram in exact integer parts-per-million,
    * and the gate flags the bottom decile. Common trigrams ⇒ high
    * fluency; junk whose trigrams are corpus-rare ⇒ low. Integer-exact
    * end-to-end, so the DuckDB oracle retrains the identical model.
    *
    * Scale shape: the model is ≤ |charset|³ rows — broadcast; train and
    * score are the standard stats+apply two passes (a real pipeline
    * persists the trained counts — see q107's profile argument); both
    * groupBys partial-aggregate map-side; the decile cut comes from the
    * distributed exact percentile over the per-doc score table (never a
    * global ntile window, which would funnel every row through one
    * partition). Docs too short to score (< 3 chars) flag low — the
    * conservative curation default (q115's tie rule).
    */
  def fluencyScore(docs: DataFrame): DataFrame = {
    import graft.functions.Exact.percentileDisc
    val tri = docs.select(col("doc_id"),
      explode(charNgrams(col("text"), 3)).as("g"))
    val model = tri.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      .select(col("g"),
        expr("CAST(length(bin(cnt)) - 1 AS BIGINT)").as("bw"))
    val scored = tri.join(broadcast(model), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tri"), sum(col("bw")).as("sum_bw"))
      .withColumn("fluency_ppm", expr("(sum_bw * 1000000) div n_tri"))
      .withColumn("g1", lit(1))
    val cut = percentileDisc(scored, col("g1"), col("fluency_ppm"),
      Map("p10" -> 0.10))
    docs.select(col("doc_id")).withColumn("g1", lit(1))
      .join(scored.drop("g1"), Seq("doc_id"), "left")
      .join(broadcast(cut), "g1")
      .select(col("doc_id"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("sum_bw"), lit(0L)).as("sum_bw"),
        coalesce(col("fluency_ppm"), lit(0L)).as("fluency_ppm"),
        coalesce(col("fluency_ppm") <= col("p10"), lit(true))
          .as("low_fluency"))
      .orderBy(col("doc_id"))
  }

  // ─── BPE TRAINING (q124) ───

  /** Symbol separator for the training fold — a control char absent from
    * text corpora (loudly guarded below, never assumed). */
  private val BpeSep = "\u001f"

  /** Merge application as a left fold over the symbol array: if the
    * accumulated string's LAST symbol is exactly `a` and the next symbol
    * is `b`, append `b` with no separator (the two symbols fuse);
    * otherwise append `SEP + x`. This is exactly one non-overlapping
    * left-to-right merge pass — the fused symbol ends `a+b`, which can
    * never re-match "last symbol = a" in the same pass (b is non-empty),
    * and `endsWith(SEP + a)` cannot false-match a longer symbol ending
    * in `a`'s characters because SEP never occurs inside symbols. The
    * DuckDB oracle runs the IDENTICAL fold via list_reduce, so both
    * engines merge bit-identically. */
  private def bpeApplyMerge(sym: Column, a: String, b: String): Column = {
    val arr = split(sym, BpeSep)
    aggregate(
      slice(arr, lit(2), size(arr) - 1), element_at(arr, 1),
      (acc, x) =>
        when(x === lit(b) &&
            (acc === lit(a) || acc.endsWith(lit(BpeSep + a))),
          concat(acc, lit(b)))
        .otherwise(concat(acc, lit(BpeSep), x)))
  }

  /** Distributed BPE TRAINING — learn the first `k` merges from the
    * corpus (q108 APPLIES a given table; this is where such a table
    * comes from). The scalable shape is the one real tokenizer trainers
    * use: the corpus is touched ONCE to build the word-frequency dict
    * (distributed groupBy, map-side partial), and every training
    * iteration runs over the vocab-bounded dict — pair counts are an
    * explode + partial-aggregating groupBy weighted by word frequency,
    * the winning pair is ONE collected row per iteration (bounded ×k),
    * and the merge applies as the fold above. [[Iterate.ckpt]] per
    * iteration truncates the k-deep lineage (the q58 CC-loop lesson) —
    * and puts this loop behind the same checkpoint-mode knob as every
    * graph loop, so `checkpointMode=reliable` protects a long train
    * against executor loss too.
    * Ties break on (count DESC, lhs ASC, rhs ASC) — lowercase-ASCII
    * corpora compare identically in Spark UTF8 and DuckDB default
    * collation, so the oracle retrains the identical table. Training
    * that runs dry (no adjacent pairs left) before k merges throws
    * loudly rather than padding. */
  def trainBpeMerges(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"LangModelOps: bad merge count $k")
    val s = docs.sparkSession
    import s.implicits._
    val words = docs
      .select(explode(filter(split(col("text"), " "),
        w => w =!= lit(""))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    require(words.filter(col("w").contains(BpeSep)).limit(1).isEmpty,
      "LangModelOps: corpus contains the reserved separator \\u001f — " +
        "BPE training symbols would be ambiguous")
    var dict = words.withColumn("sym",
      expr("array_join(transform(sequence(1, length(w)), " +
        "i -> substring(w, i, 1)), chr(31))"))
      .transform(Iterate.ckpt)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to k) {
      val arr = split(col("sym"), BpeSep)
      val top = dict.filter(size(arr) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(1), size(arr) - 1),
            j => struct(element_at(arr, j).as("l"),
              element_at(arr, j + 1).as("r")))).as("pr"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      require(top.nonEmpty,
        s"LangModelOps: BPE training ran dry after ${rank - 1} merges " +
          s"(k=$k exceeds this corpus's pair supply)")
      val (a, b, c) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((rank, a, b, c))
      dict = dict
        .withColumn("sym", bpeApplyMerge(col("sym"), a, b))
        .transform(Iterate.ckpt)
    }
    merges.result().toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  // ─── true BPE (merge loop) ───

  /** The merge table, rank-ordered. WELL-FORMED by construction: each
    * side is a base character or the result of an earlier merge — the
    * property real learned BPE tables have, and what makes greedy
    * min-rank merging equal rank-sequential replacement (the oracle's
    * form). Static here (VALUES-expressible for the oracle); a learned
    * table plugs into the same encoder — the closure ships it to
    * executors exactly like a broadcast lookup. */
  val bpeMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("a", "n"), ("i", "n"), ("e", "r"),
    ("o", "r"), ("s", "t"), ("a", "t"), ("l", "e"), ("b", "le"),
    ("a", "ble"), ("t", "able"))

  private val bpeRanks: Map[(String, String), Int] =
    bpeMerges.zipWithIndex.toMap

  /** True BPE encode (the HF algorithm): repeatedly find the LOWEST-rank
    * adjacent symbol pair present and merge every occurrence of it,
    * left to right, until no mergeable pair remains. */
  def bpeTokenize(word: String): List[String] =
    bpeTokenizeWith(bpeMerges.toIndexedSeq, bpeRanks)(word)

  /** [[bpeTokenize]] parameterized by ANY rank-ordered merge table —
    * in particular one LEARNED by [[trainBpeMerges]] (train → collect
    * the ≤ k-row table → encode; the closure ships to executors like a
    * broadcast lookup, exactly as the static table does). */
  def bpeTokenizeWith(merges: IndexedSeq[(String, String)],
      ranks: Map[(String, String), Int])(word: String): List[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
        done = syms.length < 2
      }
    }
    syms.toList
  }

  /** Per-doc (word count, BPE token count) — one fused pass, no explode
    * (the counts are the downstream packing/budgeting signal; per-token
    * rows would 10× the data for nothing). */
  private val bpeStatsUdf = udf((text: String) => {
    val ws = text.split(' ').filter(_.nonEmpty)
    (ws.length.toLong, ws.map(w => bpeTokenize(w).length.toLong).sum)
  })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // trained char-trigram language ID over corpus + held-out sentences:
    // profiles learned from the labeled training table, never from the
    // prediction set
    "q107_lang_ngram" -> ((s, d) => {
      import s.implicits._
      val profiles =
        trainLangProfiles(langTrainRows.toDF("lang", "text"), topM = 64)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .unionByName(langTestRows.toDF("doc_id", "text"))
      langIdTrained(Tables.spread(docs), profiles)
    }),

    // BPE TRAINING: learn the first 6 merges from the corpus — the
    // word-freq dict is the only corpus pass; each iteration is a
    // vocab-bounded pair count + one collected argmax row; the oracle
    // retrains the identical table through 6 unrolled fold stages
    "q124_bpe_train" -> ((s, d) =>
      trainBpeMerges(
        Tables.documents(s, d).select(col("doc_id"), col("text")), 6)),

    // true BPE token accounting per doc from the rank-ordered merge table
    "q108_bpe_merge" -> ((s, d) => {
      Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"), bpeStatsUdf(col("text")).as("b"))
        .select(col("doc_id"), col("b._1").as("n_words"),
          col("b._2").as("n_bpe_tokens"))
        .orderBy(col("doc_id"))
    }),

    // corpus-trained trigram-LM fluency gate (quantized perplexity):
    // model trained from the same table the oracle reads, bottom decile
    // flagged via the distributed exact percentile
    "q119_lm_fluency" -> ((s, d) =>
      fluencyScore(Tables.spread(
        Tables.documents(s, d).select(col("doc_id"), col("text"))))),

    // trained quality classifier over corpus + held-out sentences:
    // integer token weights learned from the labeled table, never from
    // the prediction set; cross-multiplied class-frequency argmax
    "q115_quality_classifier" -> ((s, d) => {
      import s.implicits._
      val (weights, totals) =
        trainQualityWeights(qualityTrainRows.toDF("label", "text"))
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .unionByName(qualityTestRows.toDF("doc_id", "text"))
      qualityClassify(Tables.spread(docs), weights, totals)
    }))

  private def trainValues: String = langTrainRows
    .map { case (l, t) => s"('$l', '$t')" }.mkString(",\n             ")

  private def testValues: String = langTestRows
    .map { case (id, t) => s"($id, '$t')" }.mkString(",\n             ")

  private def qualityTrainValues: String = qualityTrainRows
    .map { case (l, t) => s"('$l', '$t')" }.mkString(",\n             ")

  private def qualityTestValues: String = qualityTestRows
    .map { case (id, t) => s"($id, '$t')" }.mkString(",\n             ")

  /** Rank-sequential replacement on the spaced-symbol form — equivalent
    * to greedy min-rank BPE because the table is well-formed (see
    * [[bpeMerges]]); each merge's replace is applied 4× (left-to-right
    * `replace` consumes the shared separator, so adjacent repeats of a
    * pair need ⌈log₂⌉+1 passes — 4 covers words far beyond the corpus'
    * longest). */
  private def bpeCountSql: String = {
    val spaced =
      "' ' || array_to_string(list_transform(range(1, length(w)+1), i -> w[i]), ' ') || ' '"
    val merged = bpeMerges.foldLeft(spaced) { case (acc, (a, b)) =>
      (1 to 4).foldLeft(acc)((e, _) => s"replace($e, ' $a $b ', ' $a$b ')")
    }
    s"len(list_filter(string_split($merged, ' '), x -> x <> ''))"
  }

  /** The q124 oracle, generated: k unrolled train stages (DuckDB has no
    * iterative driver, so the loop is written out — each stage's pair
    * count, argmax, and merge fold are textually identical modulo the
    * stage index). chr(31) is [[BpeSep]]. */
  private def bpeTrainOracle(k: Int): String = {
    def stage(i: Int): String = {
      val prev = s"d${i - 1}"
      s"""p$i AS (
           SELECT pr.l AS l, pr.r AS r, sum(freq) AS cnt
           FROM (
             SELECT freq, unnest(list_transform(range(1, len(arr)),
               j -> struct_pack(l := arr[j], r := arr[j+1]))) AS pr
             FROM (SELECT freq, string_split(sym, chr(31)) AS arr FROM $prev)
             WHERE len(arr) >= 2)
           GROUP BY pr.l, pr.r),
         m$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
         d$i AS (
           SELECT w, freq,
             list_reduce(string_split(sym, chr(31)),
               (acc, x) -> CASE WHEN x = m.r AND (acc = m.l OR
                   ends_with(acc, chr(31) || m.l))
                 THEN acc || x ELSE acc || chr(31) || x END) AS sym
           FROM $prev CROSS JOIN m$i m)"""
    }
    val unions = (1 to k).map(i =>
      s"SELECT $i AS merge_rank, l AS lhs, r AS rhs, " +
        s"CAST(cnt AS BIGINT) AS pair_count FROM m$i").mkString(
      " UNION ALL ")
    s"""WITH words AS (
           SELECT w, count(*) AS freq FROM (
             SELECT unnest(list_filter(string_split(text, ' '),
               x -> x <> '')) AS w
             FROM documents) GROUP BY w),
         d0 AS (
           SELECT w, freq,
             array_to_string(list_transform(range(1, len(w) + 1),
               i -> substr(w, i, 1)), chr(31)) AS sym
           FROM words),
         ${(1 to k).map(stage).mkString(",\n         ")}
         SELECT * FROM ($unions) ORDER BY merge_rank"""
  }

  def oracle: Map[String, String] = Map(
    // the full train→predict mirror: identical profiles (top-64 per lang
    // by (cnt DESC, gram ASC)), identical counted-overlap scores,
    // identical (score DESC, lang DESC) argmax and und fallback
    "q107_lang_ngram" ->
      s"""WITH train(lang, text) AS (VALUES
             $trainValues),
         tri_t AS (
           SELECT lang,
             unnest(list_transform(range(1, length(text) - 1),
               i -> substring(text, i, 3))) AS g
           FROM train),
         counts AS (
           SELECT lang, g, count(*) AS cnt FROM tri_t GROUP BY lang, g),
         prof AS (
           SELECT lang, g FROM (
             SELECT lang, g, row_number() OVER (PARTITION BY lang
               ORDER BY cnt DESC, g) AS rn FROM counts) t
           WHERE rn <= 64),
         corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT * FROM (VALUES
             $testValues) v(doc_id, text)),
         tri_d AS (
           SELECT doc_id,
             unnest(list_transform(range(1, length(text) - 1),
               i -> substring(text, i, 3))) AS g
           FROM corpus),
         scores AS (
           SELECT d.doc_id, p.lang, count(*) AS score
           FROM tri_d d JOIN prof p USING (g)
           GROUP BY d.doc_id, p.lang),
         best AS (
           SELECT doc_id, lang, score FROM (
             SELECT doc_id, lang, score, row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
             FROM scores) t
           WHERE rn = 1)
         SELECT c.doc_id, coalesce(b.lang, 'und') AS pred_lang,
           CAST(coalesce(b.score, 0) AS BIGINT) AS score
         FROM corpus c LEFT JOIN best b USING (doc_id)
         ORDER BY c.doc_id""",

    // the full retrain mirror: identical word-freq dict, identical
    // adjacent-pair counts, identical (count DESC, lhs, rhs) argmax,
    // and the IDENTICAL merge fold (list_reduce ≡ Spark's aggregate
    // HOF) — 6 unrolled stages, each building on the previous dict
    "q124_bpe_train" -> bpeTrainOracle(6),

    "q108_bpe_merge" ->
      s"""WITH words AS (
           SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS w
           FROM documents),
         tok AS (
           SELECT doc_id, $bpeCountSql AS n_tok FROM words),
         agg AS (
           SELECT doc_id, count(*) AS n_words,
             CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens
           FROM tok GROUP BY doc_id)
         SELECT d.doc_id, CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
           CAST(coalesce(a.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
         FROM documents d LEFT JOIN agg a USING (doc_id)
         ORDER BY d.doc_id""",

    // the full train→score mirror: identical trigram counts, identical
    // integer bit-quantized weights, identical ppm normalization and
    // decile cut (quantile_disc ≡ the distributed percentileDisc —
    // SQL-standard percentile_disc semantics on both sides)
    "q119_lm_fluency" ->
      """WITH tri AS (
           SELECT doc_id,
             unnest(list_transform(range(1, length(text) - 1),
               i -> substring(text, i, 3))) AS g
           FROM documents),
         model AS (
           SELECT g, CAST(length(bin(count(*))) - 1 AS BIGINT) AS bw
           FROM tri GROUP BY g),
         sc AS (
           SELECT t.doc_id, count(*) AS n_tri,
             CAST(sum(m.bw) AS BIGINT) AS sum_bw
           FROM tri t JOIN model m USING (g) GROUP BY t.doc_id),
         f AS (
           SELECT doc_id, n_tri, sum_bw,
             (sum_bw * 1000000) // n_tri AS fluency_ppm
           FROM sc),
         cut AS (SELECT quantile_disc(fluency_ppm, 0.10) AS p10 FROM f)
         SELECT d.doc_id,
           CAST(coalesce(f.n_tri, 0) AS BIGINT) AS n_tri,
           CAST(coalesce(f.sum_bw, 0) AS BIGINT) AS sum_bw,
           CAST(coalesce(f.fluency_ppm, 0) AS BIGINT) AS fluency_ppm,
           coalesce(f.fluency_ppm <= c.p10, TRUE) AS low_fluency
         FROM documents d LEFT JOIN f USING (doc_id) CROSS JOIN cut c
         ORDER BY d.doc_id""",

    // the full train→classify mirror: identical integer token weights,
    // identical cross-multiplied class-frequency scores, identical
    // tie-to-lo argmax
    "q115_quality_classifier" ->
      s"""WITH train(label, text) AS (VALUES
             $qualityTrainValues),
         tok_t AS (
           SELECT label,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
               x -> x <> '')) AS w
           FROM train),
         weights AS (
           SELECT w,
             sum(CASE WHEN label = 'hi' THEN 1 ELSE 0 END) AS cnt_hi,
             sum(CASE WHEN label = 'lo' THEN 1 ELSE 0 END) AS cnt_lo
           FROM tok_t GROUP BY w),
         totals AS (
           SELECT
             sum(CASE WHEN label = 'hi' THEN 1 ELSE 0 END) AS t_hi,
             sum(CASE WHEN label = 'lo' THEN 1 ELSE 0 END) AS t_lo
           FROM tok_t),
         corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT * FROM (VALUES
             $qualityTestValues) v(doc_id, text)),
         dtok AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
               x -> x <> '')) AS w
           FROM corpus),
         raw AS (
           SELECT d.doc_id, sum(wt.cnt_hi) AS raw_hi,
             sum(wt.cnt_lo) AS raw_lo
           FROM dtok d JOIN weights wt USING (w)
           GROUP BY d.doc_id)
         SELECT c.doc_id,
           CASE WHEN coalesce(r.raw_hi, 0) * t.t_lo >
                     coalesce(r.raw_lo, 0) * t.t_hi
             THEN 'hi' ELSE 'lo' END AS pred_label,
           CAST(coalesce(r.raw_hi, 0) * t.t_lo AS BIGINT) AS s_hi,
           CAST(coalesce(r.raw_lo, 0) * t.t_hi AS BIGINT) AS s_lo
         FROM corpus c LEFT JOIN raw r USING (doc_id) CROSS JOIN totals t
         ORDER BY c.doc_id""")
}
