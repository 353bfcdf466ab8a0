package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

/** Bin-bucketed interval joins (operators/IntervalJoin.scala): the binned
  * rewrite must be ROW-IDENTICAL to the naive non-equi predicate join on
  * hostile data — nulls, empty and reversed intervals, negative values
  * (floor-vs-truncate binning), boundary-exact points, spans across many
  * bins — at several bin widths; and it must plan an equijoin where the
  * naive form nested-loops. */
class IntervalJoinSpec extends SparkSpecBase {
  import spark.implicits._

  // ─── hostile fixtures ───

  // points: boundary-exact values, negatives, zero, null, far outliers
  private lazy val points: DataFrame = Seq[(Long, Option[Long])](
    (1L, Some(0L)), (2L, Some(1L)), (3L, Some(9L)), (4L, Some(10L)),
    (5L, Some(11L)), (6L, Some(-1L)), (7L, Some(-10L)), (8L, Some(-11L)),
    (9L, Some(100L)), (10L, Some(999L)), (11L, None), (12L, Some(55L)),
    (13L, Some(-100L)), (14L, Some(1000000L)), (15L, Some(7L))
  ).toDF("p_id", "x")

  // intervals: ordinary, empty (lo==hi), reversed, null-bounded, negative,
  // single-point, wide (many bins), overlapping each other, boundary-tight
  private lazy val intervals: DataFrame = Seq[(Long, Option[Long], Option[Long])](
    (101L, Some(0L), Some(10L)),     // [0,10): catches 0,1,9 not 10
    (102L, Some(10L), Some(11L)),    // single-point [10,11)
    (103L, Some(5L), Some(5L)),      // empty
    (104L, Some(20L), Some(15L)),    // reversed
    (105L, Some(-15L), Some(-5L)),   // negative range
    (106L, Some(-5L), Some(5L)),     // straddles zero
    (107L, Some(0L), Some(1000L)),   // wide: many bins at small widths
    (108L, None, Some(10L)),         // null lo
    (109L, Some(0L), None),          // null hi
    (110L, Some(50L), Some(60L)),
    (111L, Some(54L), Some(56L)),    // overlaps 110
    (112L, Some(999L), Some(1000L)), // boundary-tight at a point
    (113L, Some(-2000000L), Some(2000000L)) // covers almost everything
  ).toDF("iv_id", "lo", "hi")

  // NOTE: with the BandJoinRewrite rule on (the suite default), this
  // "naive" join may itself plan binned via the sampled width — tests
  // whose point is the TRULY naive plan must wrap uses in rule-off
  private def naivePoint: DataFrame =
    points.join(intervals,
      col("x") >= col("lo") && col("x") < col("hi"))

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toSeq.mkString("|")).groupBy(identity)
      .map { case (k, v) => (k, v.length) }

  test("pointInInterval ≡ naive predicate join at several bin widths") {
    // the oracle must be the TRULY naive nested-loop rows, not the
    // rewrite's own output (which would make this test circular)
    spark.conf.set("spark.graft.rewrite.bandJoin.enabled", "false")
    val expected =
      try multiset(naivePoint)
      finally spark.conf.unset("spark.graft.rewrite.bandJoin.enabled")
    assert(expected.nonEmpty, "fixture must produce matches")
    for (w <- Seq(1L, 3L, 10L, 1000L, 5000000L)) {
      val got = multiset(IntervalJoin.pointInInterval(
        points, "x", intervals, "lo", "hi", binWidth = w,
        maxBinsPerInterval = 5000000))
      assert(got == expected, s"binWidth=$w diverged from the naive join")
    }
  }

  test("negative values bin by FLOOR, not truncation") {
    // x=-1 at width 10 must land in bin -1 with [-5,5) (also bin -1 .. 0);
    // a truncating division would put x=-1 in bin 0 and still match here,
    // so pin the one case truncation breaks: x=-11 vs [-15,-5) at w=10 —
    // floor(-11/10) = -2 = floor(-15/10)'s range head; trunc(-11/10) = -1
    // would miss the interval's bins {-2, -1}... so pin via the full
    // equivalence on a width where trunc and floor disagree for BOTH a
    // matching and a non-matching pair
    val p = Seq((1L, -11L), (2L, -1L), (3L, -10L)).toDF("p_id", "x")
    val iv = Seq((9L, -15L, -5L)).toDF("iv_id", "lo", "hi")
    val got = IntervalJoin.pointInInterval(p, "x", iv, "lo", "hi", 10L)
      .select("p_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 3L)) // -11 and -10 are in [-15,-5); -1 is not
  }

  test("intervalOverlap ≡ naive overlap join at several bin widths") {
    val left = Seq[(Long, Option[Long], Option[Long])](
      (1L, Some(0L), Some(10L)), (2L, Some(5L), Some(15L)),
      (3L, Some(20L), Some(20L)),   // empty
      (4L, Some(30L), Some(25L)),   // reversed
      (5L, Some(-10L), Some(-2L)), (6L, Some(-5L), Some(500L)), // wide
      (7L, None, Some(10L)), (8L, Some(40L), Some(41L)),
      (9L, Some(100L), Some(200L))
    ).toDF("a_id", "a_lo", "a_hi")
    val right = Seq[(Long, Option[Long], Option[Long])](
      (11L, Some(9L), Some(12L)), (12L, Some(10L), Some(11L)),
      (13L, Some(-20L), Some(-9L)), (14L, Some(0L), None),
      (15L, Some(199L), Some(300L)), (16L, Some(41L), Some(50L)),
      (17L, Some(-1000L), Some(1000L)), (18L, Some(15L), Some(15L))
    ).toDF("b_id", "b_lo", "b_hi")
    // SET-intersection semantics: the raw band predicate alone would
    // claim an empty interval [20,20) "overlaps" anything strictly
    // containing its point — the naive form of set overlap needs the
    // nonempty guards too (the operator pins them; the binWidth sweep
    // below proves the binned rewrite implements exactly this)
    val expected = multiset(left.join(right,
      col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi") &&
        col("a_lo") < col("a_hi") && col("b_lo") < col("b_hi")))
    assert(expected.nonEmpty, "fixture must produce overlaps")
    for (w <- Seq(1L, 7L, 100L, 10000L)) {
      val got = multiset(IntervalJoin.intervalOverlap(
        left, "a_lo", "a_hi", right, "b_lo", "b_hi", binWidth = w,
        maxBinsPerInterval = 5000000))
      assert(got == expected, s"binWidth=$w diverged from the naive overlap")
    }
  }

  test("empty and reversed intervals overlap NOTHING (set semantics)") {
    // [20,20) is the empty set; the raw band predicate (a_lo < b_hi &&
    // b_lo < a_hi) would nonetheless pair it with any interval strictly
    // containing 20 — the classic half-open-overlap footgun. The
    // operator pins set-intersection semantics instead.
    val l = Seq((1L, 20L, 20L), (2L, 30L, 25L)).toDF("a_id", "a_lo", "a_hi")
    val r = Seq((9L, -1000L, 1000L)).toDF("b_id", "b_lo", "b_hi")
    assert(IntervalJoin.intervalOverlap(
      l, "a_lo", "a_hi", r, "b_lo", "b_hi", 10L).collect().isEmpty)
  }

  test("binned plan is an equijoin; the naive form nested-loops") {
    val binned = IntervalJoin.pointInInterval(
      points, "x", intervals, "lo", "hi", 10L, maxBinsPerInterval = 500000)
    val bp = binned.queryExecution.executedPlan.toString
    assert(!bp.contains("BroadcastNestedLoopJoin") &&
      !bp.contains("CartesianProduct"),
      s"binned interval join fell back to a nested loop:\n$bp")
    // the naive predicate-only join is exactly the plan this operator
    // (and the BandJoinRewrite rule) exist to avoid — with the rule
    // fully off, since its sampled-width path now rescues even these
    // free-form fixtures
    spark.conf.set("spark.graft.rewrite.bandJoin.enabled", "false")
    try {
      val np = naivePoint.queryExecution.executedPlan.toString
      assert(np.contains("BroadcastNestedLoopJoin") ||
        np.contains("CartesianProduct"),
        s"expected the naive form to nested-loop (did Spark learn band " +
          s"joins? then the operator can retire):\n$np")
    } finally
      spark.conf.unset("spark.graft.rewrite.bandJoin.enabled")
  }

  test("loud guards: bad width, wrong type, name clash, span explosion") {
    intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(points, "x", intervals, "lo", "hi", 0L)
    }
    intercept[IllegalArgumentException] { // wrong type (int, not long)
      val p = Seq((1, 2)).toDF("p_id", "x")
      IntervalJoin.pointInInterval(p, "p_id", intervals, "lo", "hi", 1L)
    }
    intercept[IllegalArgumentException] { // missing column
      IntervalJoin.pointInInterval(points, "nope", intervals, "lo", "hi", 1L)
    }
    intercept[IllegalArgumentException] { // name clash across sides
      val iv = intervals.withColumnRenamed("iv_id", "x")
      IntervalJoin.pointInInterval(points, "x", iv, "lo", "hi", 1L)
    }
    // an interval spanning >= maxBins bins must raise LOUDLY at run time,
    // not silently explode the shuffle
    val e = intercept[Exception] {
      IntervalJoin.pointInInterval(points, "x", intervals, "lo", "hi",
        binWidth = 1L, maxBinsPerInterval = 4).count()
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("spans >= 4 bins"),
      s"expected the span guard to fire, got: $chain")
  }

  test("streaming composition: a point STREAM bin-joins a static interval table") {
    // the rewrite's join is a plain equijoin + filters, so a streaming
    // points side composes as a stateless stream-static join — no
    // watermark, no state store, per-batch output = the batch operator
    // on the batch's rows (which is exactly what this pins)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s = spark
    val input = MemoryStream[(Long, Long)](spark)
    val pts = input.toDF().toDF("p_id", "x")
    val q = IntervalJoin.pointInInterval(pts, "x", intervals, "lo", "hi",
        10L, maxBinsPerInterval = 500000)
      .writeStream.format("memory").queryName("ij_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, 0L), (2L, 55L), (3L, -11L))
      q.processAllAvailable()
      input.addData((4L, 999L), (5L, 12345L))
      q.processAllAvailable()
      val got = multiset(spark.table("ij_stream"))
      val batch = multiset(IntervalJoin.pointInInterval(
        Seq((1L, 0L), (2L, 55L), (3L, -11L), (4L, 999L), (5L, 12345L))
          .toDF("p_id", "x"),
        "x", intervals, "lo", "hi", 10L, maxBinsPerInterval = 500000))
      assert(got == batch, "streamed bin join diverged from the batch form")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("q118/q120 run end-to-end on the test tables and agree with naive forms") {
    val q118 = SparkEntry.queries("q118_interval_join")(spark, sf)
    val rows = q118.collect()
    assert(rows.nonEmpty, "q118 produced no campaign rows")
    // independent naive recomputation of the same result
    val camp = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        pmod(col("o_orderkey"), lit(7)) === lit(0))
      .select(col("o_orderkey").as("camp_id"),
        unix_timestamp(col("o_orderdate")).as("lo"),
        (unix_timestamp(col("o_orderdate")) + lit(5L * 86400L)).as("hi"))
    val pts = graft.sources.Tables.lineitem(spark, sf)
      .select(unix_timestamp(col("l_shipdate")).as("x"), col("l_quantity"))
    val naive = pts.join(camp, col("x") >= col("lo") && col("x") < col("hi"))
      .groupBy(col("camp_id"))
      .agg(count(lit(1)).as("n_shipped"),
        graft.functions.Exact.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("camp_id"))
    assert(rows.map(_.toSeq).toSeq == naive.collect().map(_.toSeq).toSeq)

    val q120 = SparkEntry.queries("q120_overlap_join")(spark, sf)
    assert(q120.collect().nonEmpty, "q120 produced no overlap rows")
  }
}
