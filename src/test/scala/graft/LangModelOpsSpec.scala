package graft

import org.apache.spark.sql.functions._
import graft.operators.LangModelOps

class LangModelOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("trained trigram lang-id routes every held-out sentence to its language") {
    // the whole point over the marker heuristic: the model never saw
    // these sentences, only same-language training text
    val profiles = LangModelOps.trainLangProfiles(
      LangModelOps.langTrainRows.toDF("lang", "text"))
    val preds = LangModelOps.langIdTrained(
      LangModelOps.langTestRows.toDF("doc_id", "text"), profiles)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(3000001L) == "en")
    assert(preds(3000002L) == "de")
    assert(preds(3000003L) == "fr")
    assert(preds(3000004L) == "es")
    assert(preds(3000005L) == "und", "zero trigram overlap must fall back to und")
  }

  test("profiles are per-language top-64 with deterministic tie order") {
    val prof = LangModelOps.trainLangProfiles(
      LangModelOps.langTrainRows.toDF("lang", "text"))
    val sizes = prof.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set("en", "de", "fr", "es"))
    assert(sizes.values.forall(n => n > 0 && n <= 64))
  }

  test("q107 full pipeline: corpus rows classified, score column populated") {
    val r = LangModelOps.queries("q107_lang_ngram")(spark, sf)
    val rows = r.collect()
    // corpus + the 5 planted test rows, one prediction each
    val expected = graft.sources.Tables.documents(spark, sf).count() + 5
    assert(rows.length == expected.toInt)
    // every corpus row gets a deterministic class; the synthetic database
    // vocabulary is DOMAIN-SHIFTED from all four training languages, so
    // per-row routing is genuinely ambiguous — what must hold is that the
    // trigrams still overlap some profile (nonzero score) for nearly all
    // rows, and the labels stay in the closed class set
    val corpusPreds = rows.filter(_.getLong(0) < 3000000L)
    assert(corpusPreds.forall(r =>
      Set("en", "de", "es", "fr", "und").contains(r.getString(1))))
    val nonzero = corpusPreds.count(_.getLong(2) > 0L).toDouble /
      corpusPreds.length
    assert(nonzero > 0.95, s"only ${nonzero * 100}% of corpus rows scored > 0")
  }

  test("q115: held-out docs route by the LEARNED scores alone") {
    val (weights, totals) = LangModelOps.trainQualityWeights(
      LangModelOps.qualityTrainRows.toDF("label", "text"))
    val preds = LangModelOps.qualityClassify(
      LangModelOps.qualityTestRows.toDF("doc_id", "text"), weights, totals)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // none of these sentences appear in training — routing is pure
    // learned token evidence
    assert(preds(4000001L) == "hi")
    assert(preds(4000002L) == "hi")
    assert(preds(4000003L) == "lo")
    assert(preds(4000004L) == "lo")
  }

  test("q115: zero-evidence docs route conservatively to lo; scores integer-exact") {
    val (weights, totals) = LangModelOps.trainQualityWeights(
      LangModelOps.qualityTrainRows.toDF("label", "text"))
    val out = LangModelOps.qualityClassify(
      Seq((1L, "zzz qqq vvv"), (2L, "")).toDF("doc_id", "text"),
      weights, totals).collect()
    out.foreach { r =>
      assert(r.getString(1) == "lo",
        s"no-evidence doc ${r.getLong(0)} must not pass the quality gate")
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
    }
    // the weights are raw integer counts — spot-check one loud token:
    // "free" appears only in lo training rows
    val free = weights.filter($"w" === "free").collect().head
    assert(free.getLong(1) == 0L && free.getLong(2) > 0L)
  }

  test("q119: fluency bits are integer-exact on a hand-computed micro corpus") {
    // corpus trigram counts: "aaaa"→{aaa,aaa}, "aaab"→{aaa,aab}, "xy"→{}
    //   cnt(aaa)=3 → bw = len(bin(3))-1 = 1;  cnt(aab)=1 → bw = 0
    // doc1: n_tri=2 sum_bw=2 → ppm=1_000_000; doc2: 2,1 → 500_000;
    // doc3 unscorable → zeros + flagged. p10 over {1_000_000, 500_000}
    // is 500_000 (smallest value with cdf ≥ 0.1) → doc2 flags, doc1 not.
    val docs = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "xy"))
      .toDF("doc_id", "text")
    val out = LangModelOps.fluencyScore(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((2L, 2L, 1000000L, false)))
    assert(out(2L) == ((2L, 1L, 500000L, true)))
    assert(out(3L) == ((0L, 0L, 0L, true)),
      "a doc too short to score must flag low (conservative default)")
  }

  test("q119 full pipeline: every doc scored, flags are a fluency threshold") {
    val rows = LangModelOps.queries("q119_lm_fluency")(spark, sf).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs.toInt, "one verdict per corpus doc")
    val (low, high) = rows.partition(_.getBoolean(4))
    assert(low.nonEmpty && low.length <= rows.length / 4,
      s"bottom-decile flag count off: ${low.length}/${rows.length}")
    // the flag is a pure threshold on fluency: every flagged score must
    // sit at or below every unflagged score
    assert(low.map(_.getLong(3)).max <= high.map(_.getLong(3)).min)
  }

  test("q124: BPE training learns hand-computed merges, chained") {
    // words: "aaab" x3, "ab" x2
    //   pass 1 pairs: (a,a) 2x3=6, (a,b) 3+2=5 -> merge 1 = (a,a,6)
    //   apply: aaab -> [aa,a,b] (greedy left-to-right, no same-pass
    //   re-merge), ab -> [a,b]
    //   pass 2: (aa,a)=3, (a,b)=3+2=5 -> merge 2 = (a,b,5)
    //   apply: [aa,a,b] -> [aa,ab], [a,b] -> [ab]
    //   pass 3: (aa,ab)=3 -> merge 3 = (aa,ab,3) — builds on BOTH
    //   earlier merges
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab ab ab"))
      .toDF("doc_id", "text")
    val got = LangModelOps.trainBpeMerges(docs, 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "a", "a", 6L), (2, "a", "b", 5L), (3, "aa", "ab", 3L)))
  }

  test("q124 -> q108 loop closure: a LEARNED table drives the encoder") {
    // train on the micro corpus, hand the learned table to the
    // parameterized encoder: the most frequent training word must fully
    // compress (merges chain: (a,a) -> (a,b) -> (aa,ab) == "aaab"),
    // while unseen structure stays unmerged
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab ab ab"))
      .toDF("doc_id", "text")
    val learned = LangModelOps.trainBpeMerges(docs, 3).collect()
      .map(r => (r.getString(1), r.getString(2))).toIndexedSeq
    val ranks = learned.zipWithIndex.toMap
    val enc = LangModelOps.bpeTokenizeWith(learned, ranks) _
    assert(enc("aaab") == List("aaab"),
      "the trained table must fully compress the dominant word")
    assert(enc("ab") == List("ab"))
    assert(enc("ba") == List("b", "a"), "no learned merge applies to ba")
    // greedy min-rank on partially covered structure: (a,a) merges both
    // non-overlapping occurrences first -> [aa, aa, b]; neither (a,b)
    // nor (aa,ab) is then present as an adjacent pair, so it stops
    assert(enc("aaaab") == List("aa", "aa", "b"))
  }

  test("q124: ties break lexicographically; dry corpus throws loudly") {
    val tied = Seq((1L, "cd ab"), (2L, "ab cd")).toDF("doc_id", "text")
    val m1 = LangModelOps.trainBpeMerges(tied, 1).collect()(0)
    assert((m1.getString(1), m1.getString(2), m1.getLong(3)) == (("a", "b", 2L)),
      "equal-count pairs must pick the lexicographically smallest")
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      LangModelOps.trainBpeMerges(tiny, 3) // merge 1 = (a,b); then dry
    }
    assert(e.getMessage.contains("ran dry after 1"))
  }

  test("q124: the reserved separator in a corpus fails loudly") {
    val bad = Seq((1L, "ok", "x"), (2L, ("bad" + "\u001f" + "word"), "x"))
      .toDF("doc_id", "text", "pad").drop("pad")
    intercept[IllegalArgumentException] {
      LangModelOps.trainBpeMerges(bad, 1)
    }
  }

  test("q124 full query: 6 well-formed chained merges on the corpus") {
    val rows = LangModelOps.queries("q124_bpe_train")(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 6))
    // well-formed: every lhs/rhs is a single char or an earlier merge's
    // output — the property that makes the table usable by bpeTokenize
    val produced = scala.collection.mutable.Set.empty[String]
    rows.foreach { r =>
      val (l, rr) = (r.getString(1), r.getString(2))
      assert(l.length == 1 || produced.contains(l), s"orphan lhs `$l`")
      assert(rr.length == 1 || produced.contains(rr), s"orphan rhs `$rr`")
      produced += (l + rr)
    }
    // counts are non-increasing in rank on a fixed corpus? NOT in
    // general (a merge can create a new high-frequency pair), so pin
    // only positivity
    assert(rows.forall(_.getLong(3) > 0L))
  }

  test("true BPE merge loop: greedy min-rank merging, well-formed chains") {
    assert(LangModelOps.bpeTokenize("table") == List("table"),
      "the t+able chain must fully merge")
    assert(LangModelOps.bpeTokenize("the") == List("the"))
    assert(LangModelOps.bpeTokenize("window") == List("w", "in", "d", "o", "w"))
    assert(LangModelOps.bpeTokenize("stat") == List("st", "at"))
    assert(LangModelOps.bpeTokenize("sort") == List("s", "or", "t"),
      "min-rank order: 'or'(5) beats 's t'(6) which the merge then breaks")
    assert(LangModelOps.bpeTokenize("a") == List("a"))
    assert(LangModelOps.bpeTokenize("inin") == List("in", "in"),
      "adjacent repeats of one pair must both merge")
  }

  test("q108 counts: tokens never exceed chars, merges actually compress") {
    val r = LangModelOps.queries("q108_bpe_merge")(spark, sf)
    val stats = r.join(
      graft.sources.Tables.documents(spark, sf)
        .select($"doc_id", length($"text").as("n_chars")), "doc_id")
      .agg(sum($"n_bpe_tokens"), sum($"n_chars"), sum($"n_words")).head()
    val (nTok, nChars, nWords) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    assert(nTok < nChars - nWords + 1,
      "BPE tokens must undercut the per-char count (merges fired)")
    assert(nTok >= nWords, "a word is at least one token")
  }
}
