package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Integer-exact PageRank (operators/GraphOps.scala): the distributed
  * recurrence must reproduce a straight-line single-threaded reference
  * implementation EXACTLY (same scaled-integer divs, same dangling
  * redistribution) on hand graphs with cycles, dangling nodes, and
  * asymmetric in-degrees — and the q125 plan must stay equi-join-only. */
class GraphOpsSpec extends SparkSpecBase {
  import spark.implicits._

  /** The recurrence, single-threaded: the semantic oracle the
    * distributed operator (and the DuckDB SQL) must match bit-for-bit.
    * `seeds = None` is uniform PageRank; `Some(s)` confines teleport
    * and dangling return to the seed set (TrustRank). */
  private def ref(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000L,
      seeds: Option[Set[Long]] = None): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size.toLong
    val seedSet = seeds.map(_.intersect(nodes.toSet)).getOrElse(nodes.toSet)
    val ns = seedSet.size.toLong
    val seedBase =
      ((BigInt(15) * scale * n) / (BigInt(100) * ns)).toLong
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(out.contains).map(r).sum
      val addD = dang / ns
      val sums = edges.groupBy(_._2).view
        .mapValues(_.map { case (u, _) => r(u) / out(u) }.sum).toMap
      r = nodes.map { v =>
        val isSeed = seedSet(v)
        v -> ((if (isSeed) seedBase else 0L) +
          (85L * (sums.getOrElse(v, 0L) + (if (isSeed) addD else 0L))) / 100L)
      }.toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    GraphOps.pagerank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def runSeeded(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, Long] =
    GraphOps.trustrank(edges.toDF("src", "dst"),
        seeds.toSeq.toDF("node"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // cycle 1→2→3→1, a dangling sink 4, a pure source 5
  private val hand = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (5L, 1L))

  test("distributed recurrence ≡ reference impl (cycle + dangling + source)") {
    for (iters <- Seq(1, 2, 5)) {
      val got = run(hand, iters)
      assert(got == ref(hand, iters), s"diverged at iters=$iters")
    }
  }

  test("dangling mass redistributes: a sink keeps a positive, bounded rank") {
    val got = run(hand, 5)
    val exp = ref(hand, 5)
    assert(got(4L) == exp(4L) && got(4L) > 0L)
    // total mass never exceeds N·SCALE (divs only leak downward)
    assert(got.values.sum <= 5L * 1000000L)
  }

  test("hub with many in-links from spokes outranks everything") {
    val star = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L), (5L, 1L))
    val got = run(star, 5)
    assert(got == ref(star, 5))
    assert(got(5L) == got.values.max, s"hub not top-ranked: $got")
    assert(got(1L) > got(2L), "the hub's sole out-link should outrank spokes")
  }

  test("deterministic across runs") {
    assert(run(hand, 3) == run(hand, 3))
  }

  test("trustrank ≡ seeded reference; teleport confined to seeds") {
    for (seeds <- Seq(Set(5L), Set(1L, 4L)); iters <- Seq(1, 2, 5)) {
      val got = runSeeded(hand, seeds, iters)
      assert(got == ref(hand, iters, seeds = Some(seeds)),
        s"diverged at seeds=$seeds iters=$iters")
    }
    // a node with no in-links and no seed status holds rank 0 after one
    // step: teleport mass flows ONLY to seeds
    val got1 = runSeeded(hand, Set(4L), 1)
    assert(got1(5L) == 0L, "non-seed source kept teleport mass")
    // seeds outside the graph are ignored (intersection semantics)
    assert(runSeeded(hand, Set(4L, 999L), 2)
      == ref(hand, 2, seeds = Some(Set(4L))))
  }

  test("trustrank with no seed in the graph fails loudly") {
    intercept[IllegalArgumentException] {
      GraphOps.trustrank(hand.toDF("src", "dst"),
        Seq(999L).toDF("node"), 2).collect()
    }
  }

  test("trustrank refuses a multi-column seed table") {
    intercept[IllegalArgumentException] {
      GraphOps.trustrank(hand.toDF("src", "dst"),
        Seq(("x", 5L)).toDF("name", "node"), 2).collect()
    }
  }

  test("loud guards on iters/scale") {
    intercept[IllegalArgumentException] {
      GraphOps.pagerank(hand.toDF("src", "dst"), 0)
    }
    intercept[IllegalArgumentException] {
      GraphOps.pagerank(hand.toDF("src", "dst"), 5, scale = 10L)
    }
  }

  test("co-purchase edges: lead-derived, self-loop-free, deduplicated") {
    val li = Seq(
      (1L, 1, 10L), (1L, 2, 20L), (1L, 3, 10L),  // 10→20→10
      (2L, 1, 30L), (2L, 2, 30L),                 // self-loop dropped
      (3L, 1, 10L), (3L, 2, 20L),                 // duplicate 10→20 dedups
      // DUPLICATE linenumber (the generator does this): tie-broken by
      // partkey, so the sequence is 40, 50, 60 deterministically
      (4L, 1, 50L), (4L, 1, 40L), (4L, 2, 60L)
    ).toDF("l_orderkey", "l_linenumber", "l_partkey")
    val got = GraphOps.copurchaseEdges(li)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 20L), (20L, 10L), (40L, 50L), (50L, 60L)))
  }

  test("iteration plan: equi-joins only (no cartesian, no nested loop)") {
    // the production path checkpoints each iteration (truncating the
    // visible plan), so pin the un-truncated lineage through the seam;
    // the dangling mass enters as a driver-scalar LITERAL, never a join
    val df = GraphOps.prImpl(hand.toDF("src", "dst"), None, 2,
      1000000L, truncate = false)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"a non-equi join crept into the iteration plan:\n$p")
    // and the un-truncated plan computes the same ranks
    val got = df.select(col("node"), col("rank"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref(hand, 2))
  }

  test("q125 plan: equi-joins only, deterministic top-k, rows at test SF") {
    val df = SparkEntry.queries("q125_pagerank")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"non-equi join crept in:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 must plan as TakeOrderedAndProject, not a global sort:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // ranks are positive and the ordering is (rank desc, node asc)
    assert(rows.forall(_.getLong(1) > 0L))
    val pairs = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(pairs.sameElements(pairs.sortBy { case (rk, nd) => (-rk, nd) }))
  }

  /** Brute triangle reference: try every node triple of the
    * symmetrized simple graph. */
  private def refTri(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (e._1 min e._2, e._1 max e._2)).toSet
    val nodes = und.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val cnt = scala.collection.mutable.Map[Long, Long]()
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      (x, y, z) = (nodes(i), nodes(j), nodes(k))
      if und((x, y)) && und((y, z)) && und((x, z))
      v <- Seq(x, y, z)
    } cnt(v) = cnt.getOrElse(v, 0L) + 1L
    cnt.toMap
  }

  private def runTri(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.triangleCounts(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("degree-oriented triangles ≡ brute triple enumeration") {
    // K4 (every node in 3 triangles), with noisy direction duplicates
    val k4 = for {
      x <- 1L to 4L; y <- 1L to 4L if x != y
    } yield (x, y)
    assert(runTri(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(runTri(k4) == refTri(k4))
    // star (no triangles at all) — the skew shape the orientation tames
    val star = (2L to 9L).map(i => (1L, i))
    assert(runTri(star).isEmpty && refTri(star).isEmpty)
    // wheel: hub + cycle — every rim edge closes with the hub, plus
    // self-loops and reversed duplicates that must not double-count
    val rim = (2L to 7L).map(i => (i, if (i == 7L) 2L else i + 1))
    val wheel = star.take(6) ++ rim ++ rim.map(_.swap) ++ Seq((3L, 3L))
    assert(runTri(wheel) == refTri(wheel))
    assert(runTri(wheel).nonEmpty)
  }

  test("q129 at test SF: rows, no cartesian, corner sum divisible by 3") {
    val df = SparkEntry.queries("q129_triangles")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"non-equi join:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum % 3 == 0,
      "every triangle must contribute exactly three corner counts")
  }

  /** Weighted reference: node u routes (r(u)·w) div Σw(u,·). */
  private def refW(edges: Seq[(Long, Long, Long)], iters: Int,
      scale: Long = 1000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val tw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val n = nodes.size.toLong
    val base = 15L * scale / 100L
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(tw.contains).map(r).sum
      val addD = dang / n
      val sums = edges.groupBy(_._2).view
        .mapValues(_.map { case (u, _, w) => r(u) * w / tw(u) }.sum).toMap
      r = nodes.map(v =>
        v -> (base + (85L * (sums.getOrElse(v, 0L) + addD)) / 100L)).toMap
    }
    r
  }

  test("weighted pagerank ≡ weighted reference; heavy edges dominate") {
    // 1 routes 9/10 of its mass to 2, 1/10 to 3; 4 is dangling
    val w = Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 4L, 5L))
    for (iters <- Seq(1, 3, 5)) {
      val got = GraphOps.pagerankWeighted(w.toDF("src", "dst", "w"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refW(w, iters), s"diverged at iters=$iters")
    }
    val got = GraphOps.pagerankWeighted(w.toDF("src", "dst", "w"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) > got(3L), "the heavy edge's target must outrank")
  }

  test("weighted with w = 1 is bit-identical to unweighted pagerank") {
    val ones = hand.map { case (a, b) => (a, b, 1L) }
    val gw = GraphOps.pagerankWeighted(ones.toDF("src", "dst", "w"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gw == run(hand, 4))
  }

  test("weighted pagerank refuses zero/negative/null weights") {
    intercept[IllegalArgumentException] {
      GraphOps.pagerankWeighted(
        Seq((1L, 2L, 0L)).toDF("src", "dst", "w"), 2).collect()
    }
    intercept[IllegalArgumentException] {
      GraphOps.pagerankWeighted(
        Seq((1L, 2L, -3L)).toDF("src", "dst", "w"), 2).collect()
    }
  }

  test("q131 at test SF: deterministic top-k, no cartesian, rows") {
    val df = SparkEntry.queries("q131_weighted_pagerank")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"non-equi join:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_.getLong(1) > 0L))
  }

  test("co-engagement projection: hand counts, hub cap drops entirely") {
    // entities: 1 shares {10,20,30}, 2 shares {10,20}, 3 is a HUB over
    // the cap (engages 4 items with cap=3 → contributes NOTHING),
    // 4 duplicates an engagement row (distinct-ed)
    val eng = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 30L), (3L, 40L)
    ).toDF("c", "s")
    val got = GraphOps.coengagementProjection(eng, maxPerEntity = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (10L, 20L) -> 2L, (10L, 30L) -> 1L, (20L, 30L) -> 1L),
      s"projection wrong: $got")
    // the hub's pairs are absent — including (10,40) etc.
    assert(!got.keySet.exists { case (a, b) => a == 40L || b == 40L })
  }

  test("q130 at test SF: deterministic top-k, no cartesian, rows") {
    val df = SparkEntry.queries("q130_coengagement")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"non-equi join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-100 not pushed:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)),
      "pairs must be canonical (a < b)")
  }

  test("q128 at test SF: rows, no cartesian, differs from q125's ranking") {
    val df = SparkEntry.queries("q128_trustrank")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"non-equi join:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // the seeded signal must actually differ from global centrality
    val pr = SparkEntry.queries("q125_pagerank")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tr = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tr != pr.view.filterKeys(tr.keySet).toMap,
      "trustrank collapsed to plain pagerank at the test SF")
  }
}
