package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Duplicated-span removal (TextOps.chunkDedupRewrite / q127): the
  * distributed rewrite must equal a straight-line reference on hostile
  * corpora — cross-doc dups, within-doc dups, short tail chunks, empty
  * docs, whitespace runs — and plan exactly one window, no cartesian. */
class ChunkDedupSpec extends SparkSpecBase {
  import spark.implicits._

  /** Straight-line semantics: chunk each doc into n-token groups, keep
    * a chunk occurrence iff it is the globally FIRST (docs scanned in
    * doc_id order, chunks in position order), reassemble. */
  private def ref(docs: Seq[(Long, String)],
      n: Int): Map[Long, (String, Long, Long)] = {
    val chunked = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).grouped(n)
        .map(_.mkString(" ")).toVector }
    val seen = scala.collection.mutable.Set[String]()
    val kept = chunked.sortBy(_._1).map { case (id, cs) =>
      id -> cs.filter(seen.add) }.toMap
    chunked.map { case (id, cs) =>
      id -> ((kept(id).mkString(" "), kept(id).size.toLong,
        (cs.size - kept(id).size).toLong)) }.toMap
  }

  private def run(docs: Seq[(Long, String)],
      n: Int): Map[Long, (String, Long, Long)] =
    TextOps.chunkDedupRewrite(docs.toDF("doc_id", "text"), n)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  private val tenA = (1 to 10).map(i => s"a$i").mkString(" ")
  private val tenB = (1 to 10).map(i => s"b$i").mkString(" ")

  private val hostile = Seq(
    1L -> s"$tenA $tenB",            // two clean chunks, both first
    2L -> s"$tenA x1 x2 x3 x4 x5",   // cross-doc dup chunk + unique tail
    3L -> s"$tenB $tenB",            // within-doc dup: second copy drops
    4L -> "",                        // empty doc survives as empty
    5L -> "t1 t2 t3",                // short tail-only chunk
    6L -> s"$tenA  t1  t2 t3",       // whitespace runs; tail == doc 5's
    7L -> s"$tenA",                  // whole doc duplicated elsewhere
    8L -> ((1 to 10).map(i => s"c$i").mkString(" ") + " " +
      (1 to 10).map(i => s"c$i").mkString(" ")) // PURE within-doc dup
  )

  test("distributed rewrite ≡ reference on a hostile corpus") {
    for (n <- Seq(1, 3, 10)) {
      val got = run(hostile, n)
      assert(got == ref(hostile, n), s"diverged at chunkTokens=$n")
    }
  }

  test("hand-checked: cross-doc, within-doc, tail dedup, empty doc") {
    val got = run(hostile, 10)
    assert(got(2L) == (("x1 x2 x3 x4 x5", 1L, 1L)),
      "doc 2 must lose the chunk doc 1 already owns, keep its tail")
    assert(got(3L) == (("", 0L, 2L)),
      "doc 3 loses both copies: doc 1's second chunk already owns tenB")
    assert(got(4L) == (("", 0L, 0L)), "empty doc must survive as empty")
    assert(got(6L) == (("", 0L, 2L)),
      "doc 6: both its chunks are owned by docs 1 and 5")
    assert(got(5L) == (("t1 t2 t3", 1L, 0L)),
      "doc 5 owns the tail chunk (lower doc_id)")
    assert(got(7L) == (("", 0L, 1L)))
    assert(got(8L) == (((1 to 10).map(i => s"c$i").mkString(" "), 1L, 1L)),
      "doc 8: within-doc duplicate — first copy kept, second dropped")
  }

  test("no duplicate chunk survives; kept text is a subsequence") {
    val got = run(hostile, 10)
    val all = got.values.flatMap(_._1.split(" ").filter(_.nonEmpty)
      .grouped(10).map(_.mkString(" "))).toSeq
    assert(all.distinct.size == all.size,
      "a duplicated chunk survived the rewrite")
  }

  test("q127 plan: skew-safe aggregate (no window), no cartesian") {
    val df = SparkEntry.queries("q127_chunk_dedup_rewrite")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"non-equi join:\n$p")
    // first-occurrence selection must be the partial-aggregating
    // min(struct) form — a Window here would funnel every occurrence of
    // a hyper-duplicated chunk into one task
    assert(!p.contains("Window"),
      s"first-occurrence pick regressed to a window:\n$p")
    assert(p.contains("partial_min") || p.contains("partial_"),
      s"expected a map-side partial aggregate:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // global invariant at SF: n_kept + n_dropped == chunk count, and
    // at least one duplicate chunk exists in the corpus to exercise it
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(3) >= 0))
    assert(rows.map(_.getLong(3)).sum > 0,
      "test corpus exercised no dedup at all")
  }
}
