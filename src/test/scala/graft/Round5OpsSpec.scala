package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytic, EventOps, Quality}
import graft.sources.Tables

/** Invariant checks for the round-5 operators (q76-q83). The oracle gate
  * pins exact values at sf0.01; these specs pin the SEMANTIC properties the
  * oracle can't see (funnel ordering, merge version-wins, diversity bounds,
  * clamp behavior) on sf0.001.
  */
class Round5OpsSpec extends SparkSpecBase {

  test("q76 funnel: stages are ordered and timestamps strictly increase") {
    val rows = EventOps.queries("q76_funnel_stages")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stage = r.getAs[Long]("stage")
      val v = Option(r.getAs[java.sql.Timestamp]("view_ts"))
      val c = Option(r.getAs[java.sql.Timestamp]("click_ts"))
      val p = Option(r.getAs[java.sql.Timestamp]("purchase_ts"))
      assert(stage >= 0 && stage <= 3)
      // a later stage implies every earlier stage (no gaps)
      if (p.isDefined) assert(c.isDefined && v.isDefined && stage == 3)
      else if (c.isDefined) assert(v.isDefined && stage == 2)
      else if (v.isDefined) assert(stage == 1)
      else assert(stage == 0)
      // strict event-time ordering within the funnel
      for (vt <- v; ct <- c) assert(ct.after(vt))
      for (ct <- c; pt <- p) assert(pt.after(ct))
    }
  }

  test("q77 retention: every cohort has a week-0 row covering all its users") {
    val df = EventOps.queries("q77_retention_cohorts")(spark, sf)
    val byCohort = df.collect().groupBy(_.getAs[java.sql.Date]("cohort_day"))
    assert(byCohort.nonEmpty)
    byCohort.foreach { case (_, rows) =>
      val week0 = rows.filter(_.getAs[Long]("week_offset") == 0L)
      assert(week0.length == 1, "cohort must have exactly one week-0 row")
      // week 0 contains the cohort's full population (first activity is
      // in week 0 by construction), so it is the max over offsets
      val n0 = week0.head.getAs[Long]("n_active")
      assert(rows.forall(_.getAs[Long]("n_active") <= n0))
      assert(rows.forall(_.getAs[Long]("week_offset") >= 0L))
    }
  }

  test("q78 diversity: simpson in [0,1) and unique <= total") {
    val rows = Quality.queries("q78_token_diversity")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val u = r.getAs[Long]("n_unique")
      val s = r.getAs[Double]("simpson")
      assert(u >= 1 && u <= n)
      assert(s >= 0.0 && s < 1.0)
      // single-token docs have zero diversity
      if (n == 1) assert(s == 0.0)
    }
  }

  test("q79 fuzzy neighbors: identical adjacent texts have distance 0") {
    val out = Quality.queries("q79_fuzzy_neighbors")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lev = r.getAs[Long]("lev80")
      assert(lev >= 0)
      assert(r.getAs[Boolean]("near_dup") == (lev <= 20))
    }
    // plant: duplicate an existing doc under a new id; SNM must flag the
    // adjacent pair at distance 0
    val docs = Tables.documents(spark, sf).select(col("doc_id"),
      col("lang"), col("text"))
    val planted = docs.limit(1)
      .select((col("doc_id") + 9000000L).as("doc_id"), col("lang"),
        col("text"))
    docs.union(planted).createOrReplaceTempView("r5_snm_docs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("text"), col("doc_id"))
    val flagged = spark.table("r5_snm_docs")
      .withColumn("prev_text", lag(col("text"), 1).over(w))
      .filter(col("prev_text").isNotNull &&
        levenshtein(substring(col("text"), 1, 80),
          substring(col("prev_text"), 1, 80)) === 0)
    assert(flagged.count() >= 1)
  }

  test("q80 url domains: hosts cover all docs and parse cleanly") {
    val rows = Quality.queries("q80_url_domains")(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[String]("host")
        .matches("www\\.site\\d+\\.example\\.com"))
    }
  }

  test("q81 cdc merge: deletes drop, latest version wins, rest unchanged") {
    val merged = Analytic.queries("q81_cdc_merge")(spark, sf)
      .collect().map(r => r.getAs[Long]("o_orderkey") ->
        (r.getAs[Double]("o_totalprice"), r.getAs[String]("op"))).toMap
    val orig = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(merged.nonEmpty)
    orig.foreach { case (k, price) =>
      if (k % 7 == 0) assert(!merged.contains(k), s"key $k must be deleted")
      else if (k % 5 == 0) {
        assert(merged(k)._1 == price + 1000.0, s"key $k must carry the update")
        assert(merged(k)._2 == "U")
      } else {
        assert(merged(k)._1 == price)
        assert(merged(k)._2 == "I")
      }
    }
    assert(merged.keySet == orig.keySet.filter(_ % 7 != 0))
  }

  test("q82 dispersion: corr bounded, stddev positive, n sums to table size") {
    val rows = Analytic.queries("q82_dispersion_stats")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum ==
      Tables.lineitem(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Double]("stddev_price") > 0.0)
      val c = r.getAs[Double]("corr_qty_price")
      assert(c >= -1.0 && c <= 1.0)
      assert(r.getAs[Double]("mean_price") > 0.0)
    }
  }

  test("q83 histogram: buckets partition the table and stay in range") {
    val rows = Analytic.queries("q83_price_histogram")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables.orders(spark, sf).count())
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 1 && b <= 20, "test data lies inside [0, 500000)")
      assert(r.getAs[Double]("bucket_lo") == (b - 1) * 25000.0)
    }
  }
}
