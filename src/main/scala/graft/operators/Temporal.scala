package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.functions.Exact._

/** Temporal / warehouse-reconciliation operators (round 5): snapshot
  * diffing, calendar-frame moving windows, and time-series gap filling —
  * the three passes every warehouse runs between ingestion (the
  * reference's §3.1 chain) and serving.
  *
  * Determinism notes: every aggregate is an exact DECIMAL sum (order-
  * independent, see `Exact`), calendar math is integer day arithmetic
  * (datediff from a pinned epoch — no week/month truncation conventions),
  * and the gap-fill calendar is generated from the data's own min/max so
  * the result is a pure function of the input.
  */
object Temporal {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Snapshot reconciliation (warehouse diff): per-customer revenue as of
    // two snapshot dates, FULL OUTER joined on the key, each key classified
    // added / removed / changed / same. This is the audit query behind
    // every backfill sign-off and the one place the engine needs a full
    // outer join (both sides can have keys the other lacks). At 100 TB
    // both snapshots aggregate map-side to customer cardinality BEFORE the
    // join, so the full-outer shuffle moves two key-sized tables, never
    // raw facts.
    "q88_snapshot_diff" -> ((s, d) => {
      def snap(cutoff: String) = Tables.orders(s, d)
        .filter(col("o_orderdate") < to_timestamp(lit(cutoff)))
        .groupBy(col("o_custkey"))
        .agg(sum(dec(col("o_totalprice"))).as("rev"),
          count(lit(1)).as("n"))
      val a = snap("1997-07-01").select(col("o_custkey"),
        col("rev").as("rev_old_d"), col("n").as("n_old"))
      val b = snap("1998-01-01").select(col("o_custkey"),
        col("rev").as("rev_new_d"), col("n").as("n_new"))
      a.join(b, Seq("o_custkey"), "full_outer")
        .withColumn("status",
          when(col("rev_old_d").isNull, "added")
            .when(col("rev_new_d").isNull, "removed")
            .when(col("rev_old_d") === col("rev_new_d"), "same")
            .otherwise("changed"))
        .select(col("o_custkey"),
          col("rev_old_d").cast("double").as("rev_old"),
          col("rev_new_d").cast("double").as("rev_new"),
          col("n_old"), col("n_new"), col("status"))
        .orderBy(col("o_custkey"))
    }),

    // Calendar-frame moving aggregate: 7-day trailing revenue per order
    // day via RANGE BETWEEN 6 PRECEDING on an integer day index (datediff
    // from a pinned epoch). RANGE — not ROWS — is the semantic point:
    // days missing from the data still move the frame, so a gap week
    // really drains the trailing sum. One shuffle to daily grain (map-side
    // combine does the heavy reduction), then a single unpartitioned
    // window over day cardinality — tiny, but at 100 TB you'd partition
    // this window by year if day cardinality ever mattered.
    "q90_moving_window" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(dec(col("o_totalprice"))).as("rev_d"),
          count(lit(1)).as("n_orders"))
        .withColumn("day_idx",
          datediff(col("day"), to_date(lit("1995-01-01"))).cast("long"))
      val w = Window.orderBy(col("day_idx")).rangeBetween(-6, 0)
      daily
        .withColumn("mov7_d", sum(col("rev_d")).over(w))
        .withColumn("n7", sum(col("n_orders")).over(w))
        .select(col("day"), col("n_orders"),
          col("rev_d").cast("double").as("rev"),
          col("mov7_d").cast("double").as("mov7"), col("n7"))
        .orderBy(col("day"))
    }),

    // Time-series gap fill: generate the full calendar between the data's
    // min and max day, left-join the daily counts, zero-fill the holes.
    // The calendar is sequence()-generated from a 1-row aggregate (a
    // broadcast cross join — no driver collect), and the daily counts
    // aggregate map-side before the join, so the big table is scanned
    // exactly once. The gap flag makes missing days first-class rows —
    // the precondition for any downstream interpolation or SLA check.
    "q91_gap_fill" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val calendar = span.select(explode(
        sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      calendar.join(daily, Seq("day"), "left")
        .select(col("day"),
          coalesce(col("cnt"), lit(0L)).as("n_events"),
          col("cnt").isNull.as("is_gap"))
        .orderBy(col("day"))
    }),

    // Z-order layout profile (round 5b): interleave the low 10 bits of two
    // clustering dimensions (customer, order day) into a 20-bit Z-value —
    // the space-filling-curve key behind Delta/Iceberg OPTIMIZE ZORDER —
    // and profile the top-6-bit Z-ranges: each range must cover a SMALL
    // span of BOTH dimensions (that bounded min/max spread is exactly why
    // Z-sorted files let a scan skip on either predicate). The interleave
    // is the native codegen'd `zorder2` expression (GraftExtensions):
    // branch-free magic-mask bit spreading in the scan projection — no
    // UDF, no lambda dispatch, no shuffle beyond the final tiny
    // histogram. ZOrderExprSpec pins it bit-equal to the higher-order
    // aggregate formulation the DuckDB oracle runs.
    "q96_zorder_layout" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("x", col("o_custkey").bitwiseAND(lit(1023L)))
        .withColumn("y",
          datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01")))
            .cast("long").bitwiseAND(lit(1023L)))
        .withColumn("zval",
          graft.functions.ZOrderExpr.zorder2(col("x"), col("y")))
        .groupBy(shiftright(col("zval"), 14).as("zrange"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("x")).as("x_lo"), max(col("x")).as("x_hi"),
          min(col("y")).as("y_lo"), max(col("y")).as("y_hi"))
        .orderBy(col("zrange"))
    }),

    // Incremental aggregate maintenance (round 5b): the materialized-view
    // refresh shape — a BASE aggregate over history plus a DELTA aggregate
    // over new arrivals, merged by re-aggregating the partials (sums of
    // sums, sums of counts). The mid-year cutoff forces real merging
    // (every status/year group has rows on both sides). Exact DECIMAL
    // partials are what make this valid: merge(partials) is bit-equal to
    // the full recompute the oracle runs — the algebraic property that
    // lets a 100 TB view refresh touch only the delta.
    "q97_incremental_agg" -> ((s, d) => {
      val cutoff = to_timestamp(lit("1997-03-15"))
      def part(f: org.apache.spark.sql.Column) = Tables.orders(s, d)
        .filter(f)
        .groupBy(col("o_orderstatus"),
          year(col("o_orderdate")).cast("long").as("yr"))
        .agg(sum(dec(col("o_totalprice"))).as("rev"),
          count(lit(1)).as("n"))
      part(col("o_orderdate") < cutoff)
        .unionByName(part(col("o_orderdate") >= cutoff))
        .groupBy(col("o_orderstatus"), col("yr"))
        .agg(sum(col("rev")).cast("double").as("rev"),
          sum(col("n")).cast("long").as("n_orders"))
        .orderBy(col("o_orderstatus"), col("yr"))
    }))

  def oracle: Map[String, String] = Map(
    "q88_snapshot_diff" ->
      """WITH a AS (
           SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev,
             count(*) AS n
           FROM orders WHERE o_orderdate < TIMESTAMP '1997-07-01'
           GROUP BY o_custkey),
         b AS (
           SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev,
             count(*) AS n
           FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
           GROUP BY o_custkey)
         SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
           CAST(a.rev AS DOUBLE) AS rev_old,
           CAST(b.rev AS DOUBLE) AS rev_new,
           a.n AS n_old, b.n AS n_new,
           CASE WHEN a.o_custkey IS NULL THEN 'added'
                WHEN b.o_custkey IS NULL THEN 'removed'
                WHEN a.rev = b.rev THEN 'same'
                ELSE 'changed' END AS status
         FROM a FULL JOIN b ON a.o_custkey = b.o_custkey
         ORDER BY o_custkey""",

    "q90_moving_window" ->
      """WITH daily AS (
           SELECT CAST(o_orderdate AS DATE) AS day,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev_d,
             count(*) AS n_orders,
             datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS day_idx
           FROM orders GROUP BY 1, 4)
         SELECT day, n_orders, CAST(rev_d AS DOUBLE) AS rev,
           CAST(sum(rev_d) OVER (ORDER BY day_idx
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov7,
           CAST(sum(n_orders) OVER (ORDER BY day_idx
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n7
         FROM daily ORDER BY day""",

    "q91_gap_fill" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
           FROM events GROUP BY 1),
         cal AS (
           SELECT CAST(unnest(generate_series(
             (SELECT min(day) FROM daily),
             (SELECT max(day) FROM daily),
             INTERVAL 1 DAY)) AS DATE) AS day)
         SELECT cal.day, COALESCE(daily.cnt, 0) AS n_events,
           daily.cnt IS NULL AS is_gap
         FROM cal LEFT JOIN daily ON cal.day = daily.day
         ORDER BY cal.day""",

    "q96_zorder_layout" ->
      """WITH z AS (
           SELECT o_custkey & 1023 AS x,
             datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               & 1023 AS y
           FROM orders),
         zv AS (
           SELECT x, y,
             CAST(list_sum(list_transform(range(0, 10), i ->
               (((x >> i) & 1) << (2*i)) + (((y >> i) & 1) << (2*i + 1))))
               AS BIGINT) AS zval
           FROM z)
         SELECT zval >> 14 AS zrange, count(*) AS n_orders,
           min(x) AS x_lo, max(x) AS x_hi,
           min(y) AS y_lo, max(y) AS y_hi
         FROM zv GROUP BY 1 ORDER BY 1""",

    "q97_incremental_agg" ->
      """WITH base AS (
           SELECT o_orderstatus, year(o_orderdate) AS yr,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev,
             count(*) AS n
           FROM orders WHERE o_orderdate < TIMESTAMP '1997-03-15'
           GROUP BY 1, 2),
         delta AS (
           SELECT o_orderstatus, year(o_orderdate) AS yr,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev,
             count(*) AS n
           FROM orders WHERE o_orderdate >= TIMESTAMP '1997-03-15'
           GROUP BY 1, 2),
         u AS (SELECT * FROM base UNION ALL SELECT * FROM delta)
         SELECT o_orderstatus, yr, CAST(sum(rev) AS DOUBLE) AS rev,
           CAST(sum(n) AS BIGINT) AS n_orders
         FROM u GROUP BY 1, 2 ORDER BY 1, 2""")
}
