package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The band-join optimizer rule (graft.plans.BandJoinRewrite): the NAIVE
  * point-in-interval join a user writes must plan as a bin equijoin —
  * zero BNLJ/CartesianProduct — and return bit-identical rows to the
  * unrewritten plan on hostile data (nulls, negatives, empty intervals,
  * boundary points). */
class BandJoinRewriteSpec extends SparkSpecBase {
  import spark.implicits._

  private def points: DataFrame =
    Seq(0L, 1L, 5L, 9L, 10L, 11L, 19L, 20L, -1L, -10L, -11L, 100L)
      .toDF("x").withColumn("pid", col("x") * 2)
  private def pointsWithNull: DataFrame =
    points.union(Seq((null.asInstanceOf[java.lang.Long], 999L))
      .toDF("x", "pid"))

  // hi = lo + 10 everywhere — the structural-span shape. The
  // repartition stops ConvertToLocalRelation from eagerly evaluating
  // the projection (a LocalRelation-only shortcut that would erase the
  // hi = lo + c structure; parquet-backed plans — the real case — keep
  // their Project either way).
  private def intervals: DataFrame =
    Seq(0L, 10L, -10L, -20L, 90L).toDF("lo").repartition(1)
      .select(col("lo"), (col("lo") + 10L).as("hi"),
        (col("lo") / 10L).cast("long").as("iid"))

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def rows(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("pid"), col("iid")).as[(Long, Long)]
      .collect().sorted.toSeq

  private def withRuleOff[T](body: => T): T = {
    spark.conf.set("spark.graft.rewrite.bandJoin.enabled", "false")
    try body finally
      spark.conf.unset("spark.graft.rewrite.bandJoin.enabled")
  }

  test("naive half-open band join rewrites to a bin equijoin, rows identical") {
    val joined = pointsWithNull.join(intervals,
      col("x") >= col("lo") && col("x") < col("hi"))
    val p = planOf(joined)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"rewrite did not fire:\n$p")
    val expected = withRuleOff {
      rows(pointsWithNull.join(intervals,
        col("x") >= col("lo") && col("x") < col("hi")))
    }
    assert(rows(joined) == expected)
    assert(expected.nonEmpty)
    // schema must be untouched by the rewrite (no leaked _gbin columns)
    assert(joined.columns.toSeq == Seq("x", "pid", "lo", "hi", "iid"))
  }

  test("every strictness combination matches the unrewritten plan") {
    for {
      lower <- Seq(col("x") >= col("lo"), col("x") > col("lo"))
      upper <- Seq(col("x") < col("hi"), col("x") <= col("hi"))
    } {
      val cond = lower && upper
      val joined = points.join(intervals, cond)
      val p = planOf(joined)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), s"no rewrite for $cond:\n$p")
      val expected = withRuleOff { rows(points.join(intervals, cond)) }
      assert(rows(joined) == expected, s"row drift for $cond")
    }
  }

  test("reversed operand order and point side on the right both rewrite") {
    val j1 = points.join(intervals,
      col("lo") <= col("x") && col("hi") > col("x"))
    assert(!planOf(j1).contains("BroadcastNestedLoopJoin"))
    val expected = withRuleOff { rows(j1) }
    assert(rows(j1) == expected)
    // intervals as the LEFT side
    val j2 = intervals.join(points,
      col("x") >= col("lo") && col("x") < col("hi"))
    assert(!planOf(j2).contains("BroadcastNestedLoopJoin"))
    assert(rows(j2) == expected)
  }

  test("rule off restores the nested-loop plan (the escape hatch works)") {
    withRuleOff {
      val p = planOf(points.join(intervals,
        col("x") >= col("lo") && col("x") < col("hi")))
      assert(p.contains("BroadcastNestedLoopJoin") ||
        p.contains("CartesianProduct"), s"expected the naive plan:\n$p")
    }
  }

  test("an equi conjunct disables the rewrite (hash join already exists)") {
    val j = points.join(intervals,
      col("pid") === col("iid") &&
        col("x") >= col("lo") && col("x") < col("hi"))
    val p = planOf(j)
    assert(!p.contains("_gbin"), s"rewrite fired despite equi key:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
  }

  test("free-form intervals: sampled width fires by default, rows identical") {
    // hi is an independent column, not lo + c — no structural span and
    // no config width, so the planning-time sample (max(hi - lo) over a
    // bounded scan of the interval side) must supply the width
    val free = Seq((0L, 7L, 1L), (5L, 30L, 2L), (95L, 101L, 3L))
      .toDF("lo", "hi", "iid")
    def joined = points.join(free,
      col("x") >= col("lo") && col("x") < col("hi"))
    val expected = withRuleOff { rows(joined) }
    val j = joined
    val p = planOf(j)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"sampled-width rewrite did not fire:\n$p")
    assert(rows(j) == expected)
    assert(expected.nonEmpty)
  }

  test("no width derivable anywhere (sampling off) => plan left untouched") {
    val free = Seq((0L, 7L, 1L), (5L, 30L, 2L)).toDF("lo", "hi", "iid")
    spark.conf.set("spark.graft.rewrite.bandJoin.sampleWidth", "false")
    try {
      val j = points.join(free,
        col("x") >= col("lo") && col("x") < col("hi"))
      val p = planOf(j)
      assert(p.contains("BroadcastNestedLoopJoin") ||
        p.contains("CartesianProduct"),
        s"rewrite fired without a safe width:\n$p")
    } finally
      spark.conf.unset("spark.graft.rewrite.bandJoin.sampleWidth")
  }

  test("config binWidth enables the rewrite for free-form intervals") {
    val free = Seq((0L, 7L, 1L), (5L, 30L, 2L), (95L, 101L, 3L))
      .toDF("lo", "hi", "iid")
    def joined = points.join(free,
      col("x") >= col("lo") && col("x") < col("hi"))
    val expected = withRuleOff { rows(joined) }
    spark.conf.set("spark.graft.rewrite.bandJoin.binWidth", "8")
    try {
      val j = joined
      assert(!planOf(j).contains("BroadcastNestedLoopJoin"))
      assert(rows(j) == expected)
    } finally spark.conf.unset("spark.graft.rewrite.bandJoin.binWidth")
  }

  test("an interval spanning >= maxBins bins raises loudly") {
    val wide = Seq((0L, 1L)).toDF("lo", "iid")
      .select(col("lo"), (col("lo") + 10L).as("hi"), col("iid"))
      .union(Seq((0L, 999999L, 2L)).toDF("lo", "hi", "iid"))
    spark.conf.set("spark.graft.rewrite.bandJoin.binWidth", "1")
    spark.conf.set("spark.graft.rewrite.bandJoin.maxBins", "64")
    try {
      val e = intercept[Exception] {
        points.join(wide,
          col("x") >= col("lo") && col("x") < col("hi")).collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("BandJoinRewrite")), e.toString)
    } finally {
      spark.conf.unset("spark.graft.rewrite.bandJoin.binWidth")
      spark.conf.unset("spark.graft.rewrite.bandJoin.maxBins")
    }
  }

  test("the SQL form of the band join is rewritten too") {
    points.createOrReplaceTempView("bjr_points")
    intervals.createOrReplaceTempView("bjr_intervals")
    val j = spark.sql(
      """SELECT pid, iid FROM bjr_points p JOIN bjr_intervals i
         ON p.x >= i.lo AND p.x < i.hi""")
    val p = planOf(j)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"SQL band join not rewritten:\n$p")
    val expected = withRuleOff {
      spark.sql(
        """SELECT pid, iid FROM bjr_points p JOIN bjr_intervals i
           ON p.x >= i.lo AND p.x < i.hi""")
        .as[(Long, Long)].collect().sorted.toSeq
    }
    assert(j.as[(Long, Long)].collect().sorted.toSeq == expected)
  }

  test("naive overlap join rewrites; rows identical incl. empty/inverted intervals") {
    // intervals with hi = lo + c on both sides — plus EMPTY ([20,20))
    // and INVERTED ([50,20]) rows, which the NAIVE predicate treats
    // differently than the set-semantics library operator: the rewrite
    // must reproduce the naive rows exactly
    val a = Seq((0L, 1L), (5L, 2L), (20L, 3L), (100L, 4L))
      .toDF("a_lo", "a_id").repartition(1)
      .select(col("a_lo"), (col("a_lo") + 10L).as("a_hi"), col("a_id"))
    val aWeird = a.union(Seq((20L, 20L, 90L), (50L, 20L, 91L))
      .toDF("a_lo", "a_hi", "a_id"))
    val b = Seq((3L, 1L), (8L, 2L), (90L, 3L), (-5L, 4L))
      .toDF("b_lo", "b_id").repartition(1)
      .select(col("b_lo"), (col("b_lo") + 7L).as("b_hi"), col("b_id"))
    val cond = col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi")
    def rows2(df: DataFrame): Seq[(Long, Long)] =
      df.select(col("a_id"), col("b_id")).as[(Long, Long)]
        .collect().sorted.toSeq
    val j = a.join(b, cond)
    val p = planOf(j)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"overlap rewrite did not fire:\n$p")
    assert(rows2(j) == withRuleOff { rows2(a.join(b, cond)) })
    // hostile shapes go through the conf-width path (the unions break
    // the structural span); bWide spans both of the weird a-rows'
    // bounds, so the NAIVE predicate matches the empty AND the
    // inverted interval — the semantic gap vs the set-semantics
    // library operator the rewrite must reproduce, not "fix"
    val bWide = b.union(Seq((0L, 60L, 92L)).toDF("b_lo", "b_hi", "b_id"))
    spark.conf.set("spark.graft.rewrite.bandJoin.binWidth", "8")
    try {
      val jw = aWeird.join(bWide, cond)
      assert(!planOf(jw).contains("BroadcastNestedLoopJoin"))
      val got = rows2(jw)
      assert(got == withRuleOff { rows2(aWeird.join(bWide, cond)) })
      assert(got.contains((90L, 92L)), "empty [20,20) lost its naive match")
      assert(got.contains((91L, 92L)), "inverted [50,20] lost its naive match")
      assert(got == got.distinct, "duplicate pairs: not exactly-once")
    } finally spark.conf.unset("spark.graft.rewrite.bandJoin.binWidth")
  }

  test("the SQL form of the overlap join is rewritten too") {
    val a = Seq((0L, 1L), (5L, 2L), (20L, 3L)).toDF("a_lo", "a_id")
      .repartition(1)
      .select(col("a_lo"), (col("a_lo") + 10L).as("a_hi"), col("a_id"))
    val b = Seq((3L, 1L), (8L, 2L), (-5L, 3L)).toDF("b_lo", "b_id")
      .repartition(1)
      .select(col("b_lo"), (col("b_lo") + 7L).as("b_hi"), col("b_id"))
    a.createOrReplaceTempView("bjr_ov_a")
    b.createOrReplaceTempView("bjr_ov_b")
    val sql = """SELECT a_id, b_id FROM bjr_ov_a a JOIN bjr_ov_b b
                 ON a.a_lo < b.b_hi AND b.b_lo < a.a_hi"""
    val j = spark.sql(sql)
    val p = planOf(j)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"SQL overlap join not rewritten:\n$p")
    val expected = withRuleOff {
      spark.sql(sql).as[(Long, Long)].collect().sorted.toSeq
    }
    assert(j.as[(Long, Long)].collect().sorted.toSeq == expected)
    assert(expected.nonEmpty)
  }

  private def noNlj(df: DataFrame, what: String): Unit = {
    val p = planOf(df)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"$what not rewritten:\n$p")
  }

  test("left-semi band join (the range-EXISTS shape) rewrites") {
    val cond = col("x") >= col("lo") && col("x") < col("hi")
    val j = pointsWithNull.join(intervals, cond, "left_semi")
    noNlj(j, "left-semi band join")
    val got = j.as[(Option[Long], Long)].collect().sorted.toSeq
    val expected = withRuleOff {
      pointsWithNull.join(intervals, cond, "left_semi")
        .as[(Option[Long], Long)].collect().sorted.toSeq
    }
    assert(got == expected)
    assert(got.nonEmpty)
    assert(j.columns.toSeq == Seq("x", "pid"), "semi leaked columns")
  }

  test("left-anti band join (the range-NOT-EXISTS shape) rewrites") {
    val cond = col("x") >= col("lo") && col("x") < col("hi")
    val j = pointsWithNull.join(intervals, cond, "left_anti")
    noNlj(j, "left-anti band join")
    val got = j.as[(Option[Long], Long)].collect().sorted.toSeq
    val expected = withRuleOff {
      pointsWithNull.join(intervals, cond, "left_anti")
        .as[(Option[Long], Long)].collect().sorted.toSeq
    }
    assert(got == expected)
    // the null-x point matches nothing, so anti must keep it
    assert(got.exists(_._1.isEmpty), "anti lost the null point")
  }

  test("left-outer band join with the point side on the left rewrites") {
    val cond = col("x") >= col("lo") && col("x") < col("hi")
    def run(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val j = pointsWithNull.join(intervals, cond, "left_outer")
    noNlj(j, "left-outer band join")
    val expected = withRuleOff {
      run(pointsWithNull.join(intervals, cond, "left_outer"))
    }
    val got = run(j)
    assert(got == expected)
    // unmatched points must survive null-extended, exactly once
    assert(got.exists(_.contains("null")), "no null-extended rows")
  }

  test("right-outer band join with the point side on the right rewrites") {
    val cond = col("x") >= col("lo") && col("x") < col("hi")
    def run(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val j = intervals.join(pointsWithNull, cond, "right_outer")
    noNlj(j, "right-outer band join")
    assert(run(j) == withRuleOff {
      run(intervals.join(pointsWithNull, cond, "right_outer"))
    })
  }

  test("semi/outer with the interval side preserved stay untouched") {
    val cond = col("x") >= col("lo") && col("x") < col("hi")
    // semi outputting interval rows: rewriting would need to explode
    // the OUTPUT side — must stay on the naive plan
    for ((j, what) <- Seq(
        (intervals.join(points, cond, "left_semi"), "interval-left semi"),
        (intervals.join(points, cond, "left_outer"), "interval-left outer"),
        (points.join(intervals, cond, "right_outer"),
          "interval-right right-outer"),
        (points.join(intervals, cond, "full_outer"), "full outer"))) {
      val p = planOf(j)
      assert(p.contains("BroadcastNestedLoopJoin") ||
        p.contains("CartesianProduct"), s"$what was rewritten:\n$p")
      assert(!p.contains("_gbin"), s"$what leaked bin columns:\n$p")
    }
  }

  test("SQL EXISTS with a range predicate plans as a bin semi join") {
    points.createOrReplaceTempView("bjr_ex_points")
    intervals.createOrReplaceTempView("bjr_ex_intervals")
    val sql = """SELECT pid FROM bjr_ex_points p
                 WHERE EXISTS (SELECT 1 FROM bjr_ex_intervals i
                               WHERE p.x >= i.lo AND p.x < i.hi)"""
    val j = spark.sql(sql)
    noNlj(j, "EXISTS range predicate")
    val expected = withRuleOff {
      spark.sql(sql).as[Long].collect().sorted.toSeq
    }
    assert(j.as[Long].collect().sorted.toSeq == expected)
    assert(expected.nonEmpty)
  }

  test("timestamp + INTERVAL structural span derives a SECONDS width") {
    // hi = lo + INTERVAL 2 DAYS on timestamp columns: the span literal
    // is in MICROseconds; the width must land in the seconds the
    // timestamps bin on — a micros-unit mistake in either direction
    // shows up here as the maxBins guard raising at runtime (span
    // 172800 s over a 1-second-ish width) or as one giant bin
    val tPoints = Seq(3600L, 90000L, 200000L, 250000L)
      .toDF("secs").repartition(1)
      .select(col("secs").cast("timestamp").as("x"),
        col("secs").as("pid"))
    val tIntervals = Seq(0L, 86400L, 172800L).toDF("s").repartition(1)
      .select(col("s").cast("timestamp").as("lo"),
        (col("s").cast("timestamp") + expr("INTERVAL 2 DAYS")).as("hi"),
        col("s").as("iid"))
    spark.conf.set("spark.graft.rewrite.bandJoin.maxBins", "8")
    try {
      val cond = col("x") >= col("lo") && col("x") < col("hi")
      val j = tPoints.join(tIntervals, cond)
      noNlj(j, "timestamp band join")
      val got = j.select(col("pid"), col("iid")).as[(Long, Long)]
        .collect().sorted.toSeq
      val expected = withRuleOff {
        tPoints.join(tIntervals, cond).select(col("pid"), col("iid"))
          .as[(Long, Long)].collect().sorted.toSeq
      }
      assert(got == expected)
      assert(expected.nonEmpty)
    } finally
      spark.conf.unset("spark.graft.rewrite.bandJoin.maxBins")
  }

  test("DATE-typed band join with a date_add structural span rewrites") {
    // the round-14 verdict's #1 ask: a naive date-range join must not
    // silently plan BNLJ — DateType bins on its exact days-since-epoch
    // integer, and the date_add arithmetic supplies a DAY-unit span
    val base = lit("2024-01-01").cast("date")
    val dPoints = Seq(0, 3, 9, 10, 15, 40, 100).toDF("n").repartition(1)
      .select(date_add(base, col("n")).as("d"),
        col("n").cast("long").as("pid"))
    val dIntervals = Seq(0, 7, 30, 95).toDF("m").repartition(1)
      .select(date_add(base, col("m")).as("lo"),
        date_add(date_add(base, col("m")), 10).as("hi"),
        col("m").cast("long").as("iid"))
    val cond = col("d") >= col("lo") && col("d") < col("hi")
    val j = dPoints.join(dIntervals, cond)
    noNlj(j, "date band join (date_add span)")
    val got = rows(j)
    assert(got == withRuleOff { rows(dPoints.join(dIntervals, cond)) })
    assert(got.nonEmpty)
  }

  test("DATE + INTERVAL 'n' DAY structural span rewrites in DAY units") {
    // `lo + INTERVAL 7 DAYS` on a DATE resolves to DateAdd(lo,
    // extract_days(interval)) — after constant folding the same DateAdd
    // shape as date_add; the span must land in the DAYS the dates bin
    // in, and a tight maxBins proves no µs/seconds-unit inflation
    val base = lit("2024-01-01").cast("date")
    val dPoints = Seq(0, 3, 9, 20, 33).toDF("n").repartition(1)
      .select(date_add(base, col("n")).as("d"),
        col("n").cast("long").as("pid"))
    val dIntervals = Seq(0, 14, 28).toDF("m").repartition(1)
      .select(date_add(base, col("m")).as("lo"),
        (date_add(base, col("m")) + expr("INTERVAL 7 DAYS")).as("hi"),
        col("m").cast("long").as("iid"))
    spark.conf.set("spark.graft.rewrite.bandJoin.maxBins", "8")
    try {
      val cond = col("d") >= col("lo") && col("d") < col("hi")
      val j = dPoints.join(dIntervals, cond)
      noNlj(j, "date band join (INTERVAL span)")
      val got = rows(j)
      assert(got == withRuleOff { rows(dPoints.join(dIntervals, cond)) })
      assert(got.nonEmpty)
    } finally
      spark.conf.unset("spark.graft.rewrite.bandJoin.maxBins")
  }

  test("free-form DATE columns ride the sampled width in DAY units") {
    // stored lo/hi DATE columns (no arithmetic to match): the sampling
    // job must measure the span through the days-since-epoch cast —
    // a seconds-unit mistake would inflate the width 86400× (one giant
    // bin ≈ cartesian) or, inverted, trip the maxBins guard
    val base = lit("2024-01-01").cast("date")
    val dPoints = Seq(0, 3, 9, 20, 33, 97).toDF("n").repartition(1)
      .select(date_add(base, col("n")).as("d"),
        col("n").cast("long").as("pid"))
    // no repartition: the sampled path needs no arithmetic structure,
    // and a Repartition node would (correctly) fail cheapToSample
    val free = Seq((0, 7), (5, 30), (95, 101)).toDF("a", "b")
      .select(date_add(base, col("a")).as("lo"),
        date_add(base, col("b")).as("hi"),
        col("a").cast("long").as("iid"))
    val cond = col("d") >= col("lo") && col("d") < col("hi")
    val j = dPoints.join(free, cond)
    noNlj(j, "date band join (sampled width)")
    val got = rows(j)
    assert(got == withRuleOff { rows(dPoints.join(free, cond)) })
    assert(got.nonEmpty)
  }

  test("DATE-typed overlap join rewrites through the two-sided pattern") {
    // the two-sided band (a_lo < b_hi && b_lo < a_hi) on DATE columns:
    // DateType binnability + the DateAdd structural span flow through
    // the overlap path too (width = the smaller side's span, in days)
    val base = lit("2024-01-01").cast("date")
    val a = Seq(0, 5, 20, 100).toDF("m").repartition(1)
      .select(date_add(base, col("m")).as("a_lo"),
        date_add(date_add(base, col("m")), 10).as("a_hi"),
        col("m").cast("long").as("a_id"))
    val b = Seq(3, 8, 90, -5).toDF("m").repartition(1)
      .select(date_add(base, col("m")).as("b_lo"),
        date_add(date_add(base, col("m")), 7).as("b_hi"),
        col("m").cast("long").as("b_id"))
    val cond = col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi")
    def rows2(df: DataFrame): Seq[(Long, Long)] =
      df.select(col("a_id"), col("b_id")).as[(Long, Long)]
        .collect().sorted.toSeq
    val j = a.join(b, cond)
    noNlj(j, "date overlap join")
    val got = rows2(j)
    assert(got == withRuleOff { rows2(a.join(b, cond)) })
    assert(got.nonEmpty)
  }

  test("catalog column stats supply the width with zero planning jobs") {
    // ANALYZE ... FOR COLUMNS + CBO: a range-COMPACT interval table
    // against a wide point column — the width comes from
    // max(hi) − min(lo) in the catalog, the point column's own stats
    // prove the rewrite non-degenerate (range/width ≥ statsMinBins),
    // and NO planning-time sampling job runs (listener-counted)
    spark.sql("DROP TABLE IF EXISTS bjr_stats_intervals")
    spark.sql("DROP TABLE IF EXISTS bjr_stats_points")
    Seq((0L, 45L, 1L), (980L, 1030L, 2L), (1980L, 2030L, 3L))
      .toDF("lo", "hi", "iid")
      .write.mode("overwrite").saveAsTable("bjr_stats_intervals")
    (0L to 256L).map(i => (i * 1000L, i)).toDF("x", "pid")
      .write.mode("overwrite").saveAsTable("bjr_stats_points")
    spark.sql("ANALYZE TABLE bjr_stats_intervals COMPUTE STATISTICS " +
      "FOR COLUMNS lo, hi")
    spark.sql("ANALYZE TABLE bjr_stats_points COMPUTE STATISTICS " +
      "FOR COLUMNS x")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    try {
      val cond = col("x") >= col("lo") && col("x") < col("hi")
      def joined = spark.table("bjr_stats_points")
        .join(spark.table("bjr_stats_intervals"), cond)
      val j = joined
      spark.sparkContext.addSparkListener(listener)
      val p = planOf(j) // optimize + plan, no execution
      org.apache.spark.GraftTestShims
        .waitUntilListenerBusEmpty(spark.sparkContext)
      val planned = jobs.get()
      spark.sparkContext.removeSparkListener(listener)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"stats width did not fire:\n$p")
      assert(planned == 0,
        s"planning launched $planned job(s) despite catalog stats")
      val got = rows(j)
      assert(got == withRuleOff { rows(joined) })
      assert(got.nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE IF EXISTS bjr_stats_intervals")
      spark.sql("DROP TABLE IF EXISTS bjr_stats_points")
    }
  }

  test("degenerate catalog stats are rejected, not planned as a 1-bin join") {
    // an interval table whose joint range ≈ the point range: width =
    // the whole range would collapse every row into 1-2 bins — a
    // skewed pseudo-cross-join WORSE than the nested loop. The stats
    // source must refuse (range/width < statsMinBins) and fall through
    // — here sampling is off, so the plan must stay untouched
    spark.sql("DROP TABLE IF EXISTS bjr_stats_wide")
    spark.sql("DROP TABLE IF EXISTS bjr_stats_points2")
    Seq((0L, 250000L, 1L), (1000L, 240000L, 2L))
      .toDF("lo", "hi", "iid")
      .write.mode("overwrite").saveAsTable("bjr_stats_wide")
    (0L to 256L).map(i => (i * 1000L, i)).toDF("x", "pid")
      .write.mode("overwrite").saveAsTable("bjr_stats_points2")
    spark.sql("ANALYZE TABLE bjr_stats_wide COMPUTE STATISTICS " +
      "FOR COLUMNS lo, hi")
    spark.sql("ANALYZE TABLE bjr_stats_points2 COMPUTE STATISTICS " +
      "FOR COLUMNS x")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.graft.rewrite.bandJoin.sampleWidth", "false")
    try {
      val cond = col("x") >= col("lo") && col("x") < col("hi")
      val p = planOf(spark.table("bjr_stats_points2")
        .join(spark.table("bjr_stats_wide"), cond))
      assert(p.contains("BroadcastNestedLoopJoin") ||
        p.contains("CartesianProduct"),
        s"degenerate stats width was accepted:\n$p")
      assert(!p.contains("_gbin"), s"bin columns leaked:\n$p")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.graft.rewrite.bandJoin.sampleWidth")
      spark.sql("DROP TABLE IF EXISTS bjr_stats_wide")
      spark.sql("DROP TABLE IF EXISTS bjr_stats_points2")
    }
  }

  test("rewritten naive form agrees with the library pointInInterval") {
    val lib = graft.operators.IntervalJoin.pointInInterval(
      points, "x", intervals, "lo", "hi", binWidth = 10L)
    val naive = points.join(intervals,
      col("x") >= col("lo") && col("x") < col("hi"))
    assert(rows(naive) == rows(lib))
  }

  // ─── DECIMAL bands (round-16: the money-domain shape) ───

  private def decPoints: DataFrame =
    Seq(0L, 149L, 150L, 151L, 500L, 755L, 756L, 1000L, -101L, 99999L)
      .toDF("k")
      .select((col("k").cast("decimal(12,2)") / 100).cast("decimal(12,2)")
        .as("x"), (col("k") * 2).as("pid"))

  test("DECIMAL band with a decimal structural span rewrites exactly") {
    // lo DECIMAL(12,2), hi = lo + 7.50 — the price-band shape. Bins on
    // the unscaled long (scale 2): width 750, exact, no doubles
    val iv = Seq(0L, 150L, 700L, -200L).toDF("k").repartition(1)
      .select((col("k").cast("decimal(12,2)") / 100).cast("decimal(12,2)")
        .as("lo"), col("k").as("iid"))
      .select(col("lo"), (col("lo") + lit(BigDecimal("7.50"))).as("hi"),
        col("iid"))
    val cond = col("x") >= col("lo") && col("x") < col("hi")
    val j = decPoints.join(iv, cond)
    noNlj(j, "decimal band join")
    val expected = withRuleOff { rows(decPoints.join(iv, cond)) }
    assert(rows(j) == expected)
    assert(expected.nonEmpty)
  }

  test("DECIMAL band with MIXED comparison scales rewrites (widest scale)") {
    // x is DECIMAL(10,2); lo/hi are DECIMAL(13,4)/(14,4), so the two
    // comparisons coerce x to DIFFERENT decimal types — the pairing
    // must see through the widening casts and the bins must unify on
    // the widest scale (4), or the rewrite would mis-bin one side
    val pts = Seq(0L, 5L, 7L, 100L, 755L).toDF("p").repartition(1)
      .select(col("p").cast("decimal(10,2)").as("x"), col("p").as("pid"))
    val iv = Seq(100L, 700L, 75000L).toDF("k").repartition(1)
      .select((col("k").cast("decimal(10,2)") * lit(BigDecimal("0.01")))
        .as("lo"), col("k").as("iid"))
      .select(col("lo"), (col("lo") + lit(BigDecimal("7.50"))).as("hi"),
        col("iid"))
    val cond = col("x") >= col("lo") && col("x") < col("hi")
    val j = pts.join(iv, cond)
    noNlj(j, "mixed-scale decimal band join")
    val expected = withRuleOff { rows(pts.join(iv, cond)) }
    assert(rows(j) == expected)
    assert(expected.nonEmpty)
  }

  test("DECIMAL free-form bounds ride the sampled width") {
    val iv = Seq((0L, 720L, 1L), (500L, 3000L, 2L), (99000L, 100100L, 3L))
      .toDF("l", "h", "iid")
      .select((col("l").cast("decimal(12,2)") / 100).cast("decimal(12,2)")
        .as("lo"),
        (col("h").cast("decimal(12,2)") / 100).cast("decimal(12,2)")
          .as("hi"), col("iid"))
    val cond = col("x") >= col("lo") && col("x") < col("hi")
    val j = decPoints.join(iv, cond)
    noNlj(j, "sampled decimal band join")
    val expected = withRuleOff { rows(decPoints.join(iv, cond)) }
    assert(rows(j) == expected)
    assert(expected.nonEmpty)
  }

  test("DECIMAL past 18 digits has no unscaled long — left untouched") {
    val pts = decPoints.select(col("x").cast("decimal(20,2)").as("x"),
      col("pid"))
    val iv = Seq((0L, 750L, 1L)).toDF("l", "h", "iid")
      .select((col("l").cast("decimal(20,2)") / 100).cast("decimal(20,2)")
        .as("lo"),
        (col("h").cast("decimal(20,2)") / 100).cast("decimal(20,2)")
          .as("hi"), col("iid"))
    val p = planOf(pts.join(iv,
      col("x") >= col("lo") && col("x") < col("hi")))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("CartesianProduct"),
      s"a >18-digit decimal band was rewritten (bins would overflow):\n$p")
    assert(!p.contains("_gbin"), s"bin columns leaked:\n$p")
  }

  // ─── overlap width ladder (round-16: stats + sampled parity) ───

  test("overlap join over STORED bounds rides per-side sampled widths") {
    // no structural span (independent hi columns), no config: before
    // round 16 this silently planned the nested loop. Includes an
    // EMPTY and an INVERTED interval — the sampled path normalizes
    // each side to its unordered range, so the naive predicate's
    // semantics survive
    val a = Seq((0L, 7L, 1L), (5L, 30L, 2L), (95L, 101L, 3L),
        (20L, 20L, 90L), (50L, 20L, 91L))
      .toDF("a_lo", "a_hi", "a_id")
    val b = Seq((3L, 10L, 1L), (8L, 40L, 2L), (90L, 96L, 3L),
        (0L, 60L, 92L))
      .toDF("b_lo", "b_hi", "b_id")
    val cond = col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi")
    def rows2(df: DataFrame): Seq[(Long, Long)] =
      df.select(col("a_id"), col("b_id")).as[(Long, Long)]
        .collect().sorted.toSeq
    val j = a.join(b, cond)
    noNlj(j, "stored-bounds overlap join")
    val got = rows2(j)
    assert(got == withRuleOff { rows2(a.join(b, cond)) })
    assert(got.contains((90L, 92L)), "empty [20,20) lost its naive match")
    assert(got.contains((91L, 92L)), "inverted [50,20] lost its naive match")
    assert(got == got.distinct, "duplicate pairs: not exactly-once")
  }

  test("overlap catalog stats supply the width with zero planning jobs") {
    // side A range-compact, side B wide: width = A's joint range, the
    // wider side's spread proves non-degeneracy, and NO sampling job
    // runs at planning time (listener-counted)
    spark.sql("DROP TABLE IF EXISTS bjr_ov_stats_a")
    spark.sql("DROP TABLE IF EXISTS bjr_ov_stats_b")
    Seq((0L, 40L, 1L), (10L, 50L, 2L), (30L, 45L, 3L))
      .toDF("a_lo", "a_hi", "a_id")
      .write.mode("overwrite").saveAsTable("bjr_ov_stats_a")
    (0L to 128L).map(i => (i * 1000L, i * 1000L + 30L, i))
      .toDF("b_lo", "b_hi", "b_id")
      .write.mode("overwrite").saveAsTable("bjr_ov_stats_b")
    spark.sql("ANALYZE TABLE bjr_ov_stats_a COMPUTE STATISTICS " +
      "FOR COLUMNS a_lo, a_hi")
    spark.sql("ANALYZE TABLE bjr_ov_stats_b COMPUTE STATISTICS " +
      "FOR COLUMNS b_lo, b_hi")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    try {
      val cond = col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi")
      def rows2(df: DataFrame): Seq[(Long, Long)] =
        df.select(col("a_id"), col("b_id")).as[(Long, Long)]
          .collect().sorted.toSeq
      def joined = spark.table("bjr_ov_stats_a")
        .join(spark.table("bjr_ov_stats_b"), cond)
      val j = joined
      spark.sparkContext.addSparkListener(listener)
      val p = planOf(j) // optimize + plan, no execution
      org.apache.spark.GraftTestShims
        .waitUntilListenerBusEmpty(spark.sparkContext)
      val planned = jobs.get()
      spark.sparkContext.removeSparkListener(listener)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"overlap stats width did not fire:\n$p")
      assert(planned == 0,
        s"planning launched $planned job(s) despite catalog stats")
      val got = rows2(j)
      assert(got == withRuleOff { rows2(joined) })
      assert(got.nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE IF EXISTS bjr_ov_stats_a")
      spark.sql("DROP TABLE IF EXISTS bjr_ov_stats_b")
    }
  }

  test("degenerate overlap stats are rejected (both sides blanket the line)") {
    // both sides' joint ranges cover the same timeline: width = either
    // range collapses everything into 1-2 bins — the stats source must
    // refuse; with sampling also off, the plan stays untouched
    spark.sql("DROP TABLE IF EXISTS bjr_ov_wide_a")
    spark.sql("DROP TABLE IF EXISTS bjr_ov_wide_b")
    Seq((0L, 250000L, 1L), (1000L, 240000L, 2L))
      .toDF("a_lo", "a_hi", "a_id")
      .write.mode("overwrite").saveAsTable("bjr_ov_wide_a")
    Seq((5L, 251000L, 1L), (900L, 230000L, 2L))
      .toDF("b_lo", "b_hi", "b_id")
      .write.mode("overwrite").saveAsTable("bjr_ov_wide_b")
    spark.sql("ANALYZE TABLE bjr_ov_wide_a COMPUTE STATISTICS " +
      "FOR COLUMNS a_lo, a_hi")
    spark.sql("ANALYZE TABLE bjr_ov_wide_b COMPUTE STATISTICS " +
      "FOR COLUMNS b_lo, b_hi")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.graft.rewrite.bandJoin.sampleWidth", "false")
    try {
      val cond = col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi")
      val p = planOf(spark.table("bjr_ov_wide_a")
        .join(spark.table("bjr_ov_wide_b"), cond))
      assert(p.contains("BroadcastNestedLoopJoin") ||
        p.contains("CartesianProduct"),
        s"degenerate overlap stats width was accepted:\n$p")
      assert(!p.contains("_gbin"), s"bin columns leaked:\n$p")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.graft.rewrite.bandJoin.sampleWidth")
      spark.sql("DROP TABLE IF EXISTS bjr_ov_wide_a")
      spark.sql("DROP TABLE IF EXISTS bjr_ov_wide_b")
    }
  }

  test("DECIMAL overlap join with MIXED scales rewrites (recast Least/Greatest)") {
    // the two-sided pattern over decimals of different scales: the
    // four bounds coerce to different decimal types, so the rewrite's
    // constructed Least/Greatest/equality nodes must recast to the
    // band's common type or the optimizer emits unresolved expressions
    val a = Seq((0L, 1L), (500L, 2L), (2000L, 3L)).toDF("k", "a_id")
      .repartition(1)
      .select((col("k").cast("decimal(12,2)") / 100)
        .cast("decimal(12,2)").as("a_lo"), col("a_id"))
      .select(col("a_lo"),
        (col("a_lo") + lit(BigDecimal("7.50"))).as("a_hi"), col("a_id"))
    val b = Seq((300L, 1L), (800L, 2L), (90000L, 3L)).toDF("k", "b_id")
      .repartition(1)
      .select((col("k").cast("decimal(10,2)") / 100)
        .cast("decimal(12,4)").as("b_lo"), col("b_id"))
      .select(col("b_lo"),
        (col("b_lo") + lit(BigDecimal("4.2500"))).as("b_hi"), col("b_id"))
    val cond = col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi")
    def rows2(df: DataFrame): Seq[(Long, Long)] =
      df.select(col("a_id"), col("b_id")).as[(Long, Long)]
        .collect().sorted.toSeq
    val j = a.join(b, cond)
    noNlj(j, "mixed-scale decimal overlap join")
    val got = rows2(j)
    assert(got == withRuleOff { rows2(a.join(b, cond)) })
    assert(got.nonEmpty)
  }

  test("overlap with MIXED Int/Long bounds rewrites (recast to long)") {
    // the two comparisons coerce to different integral widths (one to
    // BIGINT, one to INT): the rewrite's constructed Least/Greatest
    // must recast to long or the optimizer emits unresolved nodes —
    // newly reachable without any conf since the sampled rung
    // supplies a width for stored bounds
    val a = Seq((0L, 7, 1L), (5L, 30, 2L), (95L, 101, 3L))
      .toDF("a_lo", "a_hi", "a_id") // a_lo BIGINT, a_hi INT
    val b = Seq((3, 10L, 1L), (8, 40L, 2L), (90, 96L, 3L))
      .toDF("b_lo", "b_hi", "b_id") // b_lo INT, b_hi BIGINT
    val cond = col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi")
    def rows2(df: DataFrame): Seq[(Long, Long)] =
      df.select(col("a_id"), col("b_id")).as[(Long, Long)]
        .collect().sorted.toSeq
    val j = a.join(b, cond)
    noNlj(j, "mixed-width integral overlap join")
    val got = rows2(j)
    assert(got == withRuleOff { rows2(a.join(b, cond)) })
    assert(got.nonEmpty)
  }

  test("inverted sentinel rows never trip maxBins through the stats rung") {
    // an inverted row's true (least/greatest-normalized) span is
    // invisible to the ordered max(hi)−min(lo) stats — a width derived
    // that way would RaiseError at runtime on a query the naive plan
    // answered. The unordered joint range must over-bound it (the
    // stats rung then usually declines as degenerate and sampling —
    // which samples unordered spans — takes over): the query MUST
    // return the naive rows, never raise
    spark.sql("DROP TABLE IF EXISTS bjr_ov_inv_a")
    spark.sql("DROP TABLE IF EXISTS bjr_ov_inv_b")
    (Seq((0L, 10L, 1L), (20L, 45L, 2L), (30L, 50L, 3L)) :+
        ((2000000L, 0L, 90L))) // inverted sentinel: lo ≫ hi
      .toDF("a_lo", "a_hi", "a_id")
      .write.mode("overwrite").saveAsTable("bjr_ov_inv_a")
    ((0L to 64L).map(i => (i * 15000L, i * 15000L + 40L, i)) :+
        ((-5L, 3000000L, 900L))) // wide row that MATCHES the sentinel
      .toDF("b_lo", "b_hi", "b_id")
      .write.mode("overwrite").saveAsTable("bjr_ov_inv_b")
    spark.sql("ANALYZE TABLE bjr_ov_inv_a COMPUTE STATISTICS " +
      "FOR COLUMNS a_lo, a_hi")
    spark.sql("ANALYZE TABLE bjr_ov_inv_b COMPUTE STATISTICS " +
      "FOR COLUMNS b_lo, b_hi")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val cond = col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi")
      def rows2(df: DataFrame): Seq[(Long, Long)] =
        df.select(col("a_id"), col("b_id")).as[(Long, Long)]
          .collect().sorted.toSeq
      def joined = spark.table("bjr_ov_inv_a")
        .join(spark.table("bjr_ov_inv_b"), cond)
      val got = rows2(joined) // must not raise
      assert(got == withRuleOff { rows2(joined) })
      assert(got.nonEmpty)
      // the inverted sentinel keeps its naive match against the wide
      // row (a_lo=2e6 < b_hi=3e6 AND b_lo=-5 < a_hi=0)
      assert(got.contains((90L, 900L)),
        "the inverted sentinel lost its naive match")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE IF EXISTS bjr_ov_inv_a")
      spark.sql("DROP TABLE IF EXISTS bjr_ov_inv_b")
    }
  }

  test("overlap sampling requires BOTH sides sampleable") {
    // one side sits behind an aggregate (not cheap to execute at
    // planning time): a width blind to that side's spans could trip
    // its runtime maxBins guard, so the rewrite must NOT fire from the
    // other side's sample alone
    val a = Seq((0L, 7L, 1L), (5L, 30L, 2L)).toDF("a_lo", "a_hi", "a_id")
    val b = Seq((3L, 10L, 1L), (8L, 40L, 2L)).toDF("b_lo", "b_hi", "b_id")
      .groupBy(col("b_id")).agg(min(col("b_lo")).as("b_lo"),
        max(col("b_hi")).as("b_hi"))
    val cond = col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi")
    val p = planOf(a.join(b, cond))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("CartesianProduct"),
      s"overlap rewrote with only one side sampleable:\n$p")
    assert(!p.contains("_gbin"), s"bin columns leaked:\n$p")
  }
}
