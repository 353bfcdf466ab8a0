package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytic, Quality, Temporal}
import graft.sources.Tables

/** Invariant checks for the round-5 batch-2 operators (q88-q95). The oracle
  * gate pins exact values at sf0.01; these pin the semantic properties the
  * hash can't see (diff classification logic, moving-frame containment,
  * calendar completeness, PMI sign recomputation, clamp bounds, bucket
  * partitioning) on sf0.001.
  */
class Round5bOpsSpec extends SparkSpecBase {

  test("q88 snapshot diff: statuses are consistent with the two snapshots") {
    val rows = Temporal.queries("q88_snapshot_diff")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val old = Option(r.getAs[java.lang.Double]("rev_old"))
      val nw = Option(r.getAs[java.lang.Double]("rev_new"))
      r.getAs[String]("status") match {
        case "added" => assert(old.isEmpty && nw.isDefined)
        case "removed" => assert(old.isDefined && nw.isEmpty)
        case "same" => assert(old == nw)
        case "changed" =>
          assert(old.isDefined && nw.isDefined && old != nw)
          // orders only accrue: a later snapshot can't lose revenue
          assert(nw.get > old.get)
        case other => fail(s"unknown status $other")
      }
    }
    // snapshot B is a superset time range of A, so nothing can be removed
    assert(!rows.exists(_.getAs[String]("status") == "removed"))
  }

  test("q89 bm25: ranks are contiguous and every hit contains a query term") {
    val rows = Quality.queries("q89_bm25_rank")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("rank")).toSeq ==
      (1L to rows.length).toSeq)
    rows.foreach(r => assert(r.getAs[Long]("total_tf") >= 1L))
  }

  test("q90 moving window: the 7-day frame contains the day and is recomputable") {
    val rows = Temporal.queries("q90_moving_window")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDay = rows.map(r => r.getAs[java.sql.Date]("day").toLocalDate ->
      (r.getAs[Double]("rev"), r.getAs[Double]("mov7"),
        r.getAs[Long]("n_orders"), r.getAs[Long]("n7"))).toMap
    byDay.foreach { case (day, (_, mov7, _, n7)) =>
      // recompute the RANGE frame: calendar days day-6 .. day, missing
      // days contribute nothing
      val frame = (0 to 6).map(i => byDay.get(day.minusDays(i)))
      val expN = frame.flatten.map(_._3).sum
      val expRev = frame.flatten.map(_._1).sum
      assert(n7 == expN)
      assert(math.abs(mov7 - expRev) < 1e-6)
    }
  }

  test("q91 gap fill: calendar is complete and counts reconcile") {
    val rows = Temporal.queries("q91_gap_fill")(spark, sf).collect()
    assert(rows.nonEmpty)
    val days = rows.map(_.getAs[java.sql.Date]("day").toLocalDate)
    days.sliding(2).foreach { case Array(a, b) =>
      assert(b == a.plusDays(1), "calendar must have no holes")
    }
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_gap") == (r.getAs[Long]("n_events") == 0L))
    }
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sf).count())
  }

  test("q92 pmi: assoc boolean matches exact BigInt recomputation") {
    val rows = Quality.queries("q92_pmi_collocations")(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute the corpus totals independently
    val ws = Tables.documents(spark, sf)
      .select(graft.functions.TextFns.tokens(col("text")).as("ws"))
    val nu = ws.select(sum(size(col("ws"))).cast("long")).head.getLong(0)
    val nb = ws.select(sum(greatest(size(col("ws")) - 1, lit(0)))
      .cast("long")).head.getLong(0)
    rows.foreach { r =>
      val cxy = BigInt(r.getAs[Long]("c_xy"))
      val cx = BigInt(r.getAs[Long]("c_x"))
      val cy = BigInt(r.getAs[Long]("c_y"))
      val expected = cxy * nu * nu > cx * cy * nb
      assert(r.getAs[Boolean]("assoc") == expected,
        s"assoc mismatch for (${r.getAs[String]("x")}, ${r.getAs[String]("y")})")
      assert(cxy >= 1 && cx >= cxy && cy >= cxy)
    }
  }

  test("q93 winsorize: mean is clamped inside [p05, p95]") {
    val rows = Analytic.queries("q93_winsorize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p05 = r.getAs[Long]("p05")
      val p95 = r.getAs[Long]("p95")
      val m = r.getAs[Double]("mean_wins")
      assert(p05 <= p95)
      assert(m >= p05 && m <= p95)
      assert(r.getAs[Long]("n_docs") > 0)
    }
  }

  test("q94 equi-depth: buckets partition the table with ordered ranges") {
    val rows = Analytic.queries("q94_equidepth_histogram")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables.orders(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("bucket") >= 1 && r.getAs[Long]("bucket") <= 10)
      assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi"))
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      // equal values always share a bucket, so ranges are strictly disjoint
      assert(a.getAs[Double]("hi") < b.getAs[Double]("lo"))
      assert(a.getAs[Long]("bucket") < b.getAs[Long]("bucket"))
    }
    // equi-depth: no bucket is grossly oversized (10 buckets, allow 2x)
    val n = Tables.orders(spark, sf).count()
    rows.foreach(r => assert(r.getAs[Long]("n_orders") <= n / 5))
  }

  test("q96 z-order: every z-range bounds BOTH dimensions (locality)") {
    val rows = Temporal.queries("q96_zorder_layout")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables.orders(spark, sf).count())
    rows.foreach { r =>
      // the top 6 z-bits fix bits 9..7 of x AND y, so each range spans
      // less than 2^7 in each dimension — the skip-scan property
      assert(r.getAs[Long]("x_hi") - r.getAs[Long]("x_lo") < 128L)
      assert(r.getAs[Long]("y_hi") - r.getAs[Long]("y_lo") < 128L)
    }
  }

  test("q97 incremental agg: merged partials equal the full recompute") {
    val rows = Temporal.queries("q97_incremental_agg")(spark, sf).collect()
    assert(rows.nonEmpty)
    val full = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(graft.functions.Exact.dec(col("o_totalprice")))
          .cast("double").as("rev"),
        count(lit(1)).as("n_orders"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(rows.length == full.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("o_orderstatus"), r.getAs[Long]("yr"))
      val (rev, n) = full(k)
      assert(r.getAs[Double]("rev") == rev, s"rev mismatch for $k")
      assert(r.getAs[Long]("n_orders") == n)
    }
  }

  test("q98 curation funnel: stage counts are monotone non-increasing") {
    val rows = graft.operators.PipelineOps.queries("q98_curation_funnel")(
      spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_in")).sum ==
      Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (nIn, nLen) = (r.getAs[Long]("n_in"), r.getAs[Long]("n_len"))
      val (nDedup, nSamp) = (r.getAs[Long]("n_dedup"), r.getAs[Long]("n_sampled"))
      assert(nIn >= nLen && nLen >= nDedup && nDedup >= nSamp,
        s"funnel must only shrink: $nIn >= $nLen >= $nDedup >= $nSamp")
      assert(nDedup > 0 || nLen == 0)
    }
  }

  test("q95 skew profile: buckets are bit widths and rows reconcile") {
    val rows = Analytic.queries("q95_skew_profile")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("total_rows")).sum ==
      Tables.lineitem(spark, sf).count())
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val mx = r.getAs[Long]("max_cnt")
      // bucket = bit width of the count: 2^(b-1) <= cnt < 2^b
      assert(mx < (1L << b) && mx >= (1L << (b - 1)))
      assert(r.getAs[Long]("n_keys") >= 1)
    }
  }
}
