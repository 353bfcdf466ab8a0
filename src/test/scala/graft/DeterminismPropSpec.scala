package graft

import org.apache.spark.sql.functions._

/** Property tests for the engine's cross-engine-determinism core: the
  * claims that let query outputs hash-match a different engine at any
  * parallelism are (1) exact-decimal aggregation is partition-order
  * INDEPENDENT, and (2) the fused hash UDFs are pure functions of content.
  * Driven over seeded-random inputs (deterministic reruns), not just the
  * driver testdata.
  */
class DeterminismPropSpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  test("dotExact is permutation-invariant (decimal path, unlike IEEE doubles)") {
    import graft.functions.{VectorFns => V}
    val cases = (1 to 60).map { _ =>
      val a = Array.fill(16)(math.round(rnd.between(-10f, 10f) * 1e4f) / 1e4f)
      val b = Array.fill(16)(math.round(rnd.between(-10f, 10f) * 1e4f) / 1e4f)
      val perm = rnd.shuffle(a.indices.toList)
      (a, b, perm.map(a).toArray, perm.map(b).toArray)
    }
    val bad = cases.toDF("a", "b", "pa", "pb")
      .select(V.dotExact($"a", $"b").as("d1"),
        V.dotExact($"pa", $"pb").as("d2"))
      .filter(not($"d1" <=> $"d2")).count()
    assert(bad == 0, s"$bad permutations changed the exact dot product")
  }

  test("double-sum dot is NOT permutation-invariant (why the decimal path exists)") {
    import graft.functions.{VectorFns => V}
    // a witness, not a universal claim: among random float vectors some
    // permutation reorders the fp rounding — if this ever stops happening
    // the decimal machinery could be retired
    val cases = (1 to 500).map { _ =>
      // widely mixed magnitudes: fp addition only re-rounds under reorder
      // when operand exponents differ
      def v() = Array.fill(64)(
        rnd.between(-1f, 1f) * math.pow(10, rnd.between(-6, 7)).toFloat)
      val (a, b) = (v(), v())
      val perm = rnd.shuffle(a.indices.toList)
      (a, b, perm.map(a).toArray, perm.map(b).toArray)
    }
    val diff = cases.toDF("a", "b", "pa", "pb")
      .select(V.dot($"a", $"b").as("d1"), V.dot($"pa", $"pb").as("d2"))
      .filter($"d1" =!= $"d2").count()
    assert(diff > 0, "expected at least one fp-order divergence in 500 trials")
  }

  test("fused text UDFs are pure functions of content (stable across evals)") {
    import graft.functions.{TextFns => T}
    val vocab = Array("scan", "join", "agg", "sort", "hash", "key", "row")
    val docs = (1 to 80).map(_ =>
      Array.fill(rnd.between(1, 15))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    val bad = docs.toDF("t")
      .select(T.simhashFpUdf(3)($"t").as("f1"),
        T.simhashFpUdf(3)($"t").as("f2"),
        T.minhashSigUdf(3, 8)($"t").as("s1"),
        T.minhashSigUdf(3, 8)($"t").as("s2"))
      .filter(not($"f1" <=> $"f2") || not($"s1" <=> $"s2")).count()
    assert(bad == 0)
  }

  test("minhash signature is insensitive to shingle-array ORDER (set semantics)") {
    import graft.functions.{TextFns => T}
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h")
    val cases = (1 to 60).map { _ =>
      val ws = Array.fill(rnd.between(3, 12))(vocab(rnd.nextInt(vocab.length)))
      val sh = ws.sliding(3).map(_.mkString(" ")).toArray.distinct
      (sh, rnd.shuffle(sh.toList).toArray)
    }
    val bad = cases.toDF("sh", "shuffled")
      .select(T.minhashKmUdf(8)($"sh").as("s1"),
        T.minhashKmUdf(8)($"shuffled").as("s2"))
      .filter(not($"s1" <=> $"s2")).count()
    assert(bad == 0, "signature must depend on the SET only")
  }

  test("round-5 aggregates are shuffle-parallelism invariant (bit-equal results)") {
    // the 100 TB reproducibility property: changing the partial-aggregate
    // layout (shuffle partition count) must not change a single bit of
    // the result — exact decimal partials + integer funnels deliver this,
    // plain double sums would not
    val names = Seq("q88_snapshot_diff", "q92_pmi_collocations",
      "q97_incremental_agg", "q98_curation_funnel",
      "q99_domain_reweight", "q100_span_containment")
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def runAll(n: String) = {
      val rows = SparkEntry.queries(n)(spark, sf).collect()
      rows.map(_.toString).sorted.toSeq
    }
    try {
      names.foreach { n =>
        spark.conf.set(key, "4")
        val r4 = runAll(n)
        spark.conf.set(key, "7")
        val r7 = runAll(n)
        assert(r4 == r7, s"$n changed under a different shuffle layout")
      }
    } finally spark.conf.set(key, prev)
  }

  test("packing seq assignment: budget math is exact for any doc-length mix") {
    val budget = 512
    (1 to 100).foreach { _ =>
      // docs shorter than the budget (the q54 corpus regime, max 99
      // tokens): chunk ids are contiguous from 0
      val lens = List.fill(40)(rnd.between(1, budget))
      val ids = lens.scanLeft(0L)(_ + _).dropRight(1).map(_ / budget)
      assert(ids.head == 0L && ids.toSet == (0L to ids.max).toSet)
    }
    (1 to 100).foreach { _ =>
      // over-budget docs may SKIP chunks, but never more than their own
      // length implies, and ids stay monotone
      val lens = List.fill(40)(rnd.between(1, 3 * budget))
      val ids = lens.scanLeft(0L)(_ + _).dropRight(1).map(_ / budget)
      assert(ids.head == 0L)
      ids.zip(ids.tail).zip(lens).foreach { case ((i0, i1), len) =>
        assert(i1 >= i0 && i1 - i0 <= (len + budget - 1) / budget)
      }
    }
  }
}
