package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.sources.Tables
import graft.functions.Exact._

/** Bin-bucketed NON-EQUI interval joins (SURVEY.md §2.3 extension).
  *
  * Spark has no native interval/band join: a join whose only predicate is
  * `lo <= x AND x < hi` (no equi key) plans as BroadcastNestedLoopJoin —
  * O(|points|·|intervals|) comparisons — or, with neither side
  * broadcastable, a cartesian product. Both are the all-pairs scale
  * killer: at 10⁹ points × 10⁶ intervals that is 10¹⁵ predicate
  * evaluations for a result that is typically a few rows per point.
  *
  * The standard rewrite (the range-join optimization in Databricks
  * Runtime / Apache Sedona's 1-D case) turns the band predicate into an
  * EQUIJOIN on a derived bin key:
  *
  *   - pick a bin width `w` (in the x/lo/hi units, ideally ≈ the typical
  *     interval span);
  *   - each point joins on its single bin `floorDiv(x, w)`;
  *   - each interval explodes to the bins it covers,
  *     `floorDiv(lo, w) .. floorDiv(hi-1, w)` — `span/w + 1` rows;
  *   - the bin equijoin hash-partitions both sides (or broadcasts the
  *     exploded intervals when small), and the original predicate runs as
  *     a post-join filter on the co-located candidates.
  *
  * Matching is exactly-once by construction: a point has ONE bin, and an
  * interval's exploded bin list contains that bin at most once — no
  * dedup pass. Cost: |points| + |intervals|·(span/w + 1) shuffled rows
  * and only same-bin candidate pairs evaluated, vs every pair in the
  * nested loop. Bin skew (many intervals over one hot bin) composes with
  * the standard treatments ([[Skew.saltedJoin]], AQE skew split) because
  * the join is now a plain equijoin.
  *
  * Inner-join null semantics are preserved: a null x, lo, or hi fails
  * the bin computation or the `lo < hi` pre-filter and drops, exactly as
  * the naive predicate join drops it (pinned by IntervalJoinSpec against
  * the naive form on hostile data, including negative values — bins are
  * FLOOR divisions, computed in pure long arithmetic, so -1 at width 10
  * lands in bin -1, not bin 0).
  */
object IntervalJoin {

  /** Floor-division bin of the (long) SQL expression `e` — exact long
    * arithmetic (`div` after subtracting the positive mod), no doubles:
    * correct for negative values and for magnitudes beyond 2^53 where
    * `floor(x / w)` in floating point mis-bins. */
  private def binE(e: String, w: Long): Column =
    expr(s"(($e) - (((($e) % $w) + $w) % $w)) div $w")

  private def requireLong(df: DataFrame, c: String, side: String): Unit = {
    val f = df.schema.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(
        s"IntervalJoin: $side column `$c` not found in " +
          df.columns.mkString("[", ", ", "]")))
    require(f.dataType == LongType,
      s"IntervalJoin: $side column `$c` must be LongType (got " +
        s"${f.dataType.simpleString}) — cast timestamps via " +
        "unix_timestamp(...) and dates via unix_date(...) first, so the " +
        "bin width's unit is explicit instead of silently guessed")
  }

  private def requireDisjoint(a: DataFrame, b: DataFrame): Unit = {
    val clash = a.columns.toSet intersect b.columns.toSet
    require(clash.isEmpty,
      s"IntervalJoin: both sides carry column(s) ${clash.mkString(", ")} — " +
        "rename one side; the joined output keeps every input column")
    val reserved = (a.columns ++ b.columns).toSet
      .intersect(Set("_pbin", "_ibin", "_abin", "_bbin", "_albin", "_blbin"))
    require(reserved.isEmpty,
      s"IntervalJoin: reserved work-column name(s) ${reserved.mkString(", ")} " +
        "present in an input")
  }

  /** Exploded covered-bin column for the interval `[lo, hi)`, with a LOUD
    * per-row guard: an interval spanning ≥ `maxBins` bins raises instead
    * of silently exploding the shuffle (the caller picked a binWidth far
    * below the data's spans — a config bug, not a data condition). */
  private def coveredBins(loCol: String, hiCol: String, w: Long,
      maxBins: Int): Column = {
    val lo = binE(s"`$loCol`", w)
    val hi = binE(s"`$hiCol` - 1", w)
    when(hi - lo < lit(maxBins.toLong), sequence(lo, hi))
      .otherwise(raise_error(format_string(
        s"IntervalJoin: interval [%s, %s) spans >= $maxBins bins at " +
          s"binWidth=$w — choose a binWidth nearer the typical span " +
          "(or raise maxBinsPerInterval)",
        col(loCol), col(hiCol))).cast(ArrayType(LongType)))
  }

  /** points ⋈ intervals on `lo <= x < hi` with NO equi key, as a bin
    * equijoin (see object doc). `xCol`/`loCol`/`hiCol` must be LongType.
    * Output: every points column + every intervals column, one row per
    * qualifying (point, interval) pair. Empty (`lo >= hi`) and
    * null-bounded intervals match nothing, as in the naive inner join. */
  def pointInInterval(points: DataFrame, xCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long, maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, s"IntervalJoin: binWidth must be > 0, got $binWidth")
    requireLong(points, xCol, "points")
    requireLong(intervals, loCol, "intervals")
    requireLong(intervals, hiCol, "intervals")
    requireDisjoint(points, intervals)
    val pb = points.withColumn("_pbin", binE(s"`$xCol`", binWidth))
    val ib = intervals
      .filter(col(loCol) < col(hiCol))
      .withColumn("_ibin",
        explode(coveredBins(loCol, hiCol, binWidth, maxBinsPerInterval)))
    pb.join(ib, col("_pbin") === col("_ibin") &&
        col(xCol) >= col(loCol) && col(xCol) < col(hiCol))
      .drop("_pbin", "_ibin")
  }

  /** left ⋈ right on interval OVERLAP — SET-intersection semantics over
    * half-open intervals `[aLo, aHi)` × `[bLo, bHi)` — as a bin equijoin.
    * A pair matches iff the intervals' point sets intersect, i.e.
    * `aLo < bHi AND bLo < aHi` AND both are nonempty: the raw band
    * predicate alone would claim an empty `[20,20)` "overlaps" anything
    * strictly containing its point (spec-pinned; callers porting a naive
    * predicate join must carry the nonempty guards to match). Both sides
    * explode to covered bins; a pair can share MANY bins, so each match
    * is kept only at its canonical bin, the first bin both cover:
    * `max(binOf(aLo), binOf(bLo))` (overlap ⇒ `max(aLo, bLo)` lies in
    * both intervals ⇒ its bin is in both exploded lists) — exactly-once
    * without a dedup shuffle. All four bound columns must be LongType. */
  def intervalOverlap(left: DataFrame, aLoCol: String, aHiCol: String,
      right: DataFrame, bLoCol: String, bHiCol: String,
      binWidth: Long, maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, s"IntervalJoin: binWidth must be > 0, got $binWidth")
    requireLong(left, aLoCol, "left"); requireLong(left, aHiCol, "left")
    requireLong(right, bLoCol, "right"); requireLong(right, bHiCol, "right")
    requireDisjoint(left, right)
    val lb = left.filter(col(aLoCol) < col(aHiCol))
      .withColumn("_albin", binE(s"`$aLoCol`", binWidth))
      .withColumn("_abin",
        explode(coveredBins(aLoCol, aHiCol, binWidth, maxBinsPerInterval)))
    val rb = right.filter(col(bLoCol) < col(bHiCol))
      .withColumn("_blbin", binE(s"`$bLoCol`", binWidth))
      .withColumn("_bbin",
        explode(coveredBins(bLoCol, bHiCol, binWidth, maxBinsPerInterval)))
    lb.join(rb, col("_abin") === col("_bbin") &&
        col(aLoCol) < col(bHiCol) && col(bLoCol) < col(aHiCol) &&
        col("_abin") === greatest(col("_albin"), col("_blbin")))
      .drop("_abin", "_bbin", "_albin", "_blbin")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Campaign attribution: count lineitems shipped inside each 5-day
    // campaign window, where campaigns are a derived interval table with
    // NO key shared with lineitem — the pure band join q17 (equi+range)
    // cannot express. Binned at 1 day ≈ the 5-day span: each campaign
    // explodes to 6 bin rows; the candidate set is same-day-bin pairs
    // only. The exploded interval side is dimension-sized here and rides
    // a broadcast hash join (shuffle hash/SMJ on the bin under
    // broadcast-off — both sweep-verified); the point side never
    // explodes, never nested-loops. Oracle = the naive inequality join
    // (DuckDB plans its native IEJoin for it).
    "q118_interval_join" -> ((s, d) => {
      val camp = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          pmod(col("o_orderkey"), lit(7)) === lit(0))
        .select(col("o_orderkey").as("camp_id"),
          unix_timestamp(col("o_orderdate")).as("lo"),
          (unix_timestamp(col("o_orderdate")) + lit(5L * 86400L)).as("hi"))
      // spread: the testdata scan is a single split, so the per-row bin
      // compute + probe would run one-core; a no-op at cluster scale
      // (Tables.spread only widens scans below defaultParallelism)
      val pts = Tables.spread(Tables.lineitem(s, d)
        .select(unix_timestamp(col("l_shipdate")).as("x"), col("l_quantity")))
      pointInInterval(pts, "x", camp, "lo", "hi", binWidth = 86400L)
        .groupBy(col("camp_id"))
        .agg(count(lit(1)).as("n_shipped"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("camp_id"))
    }),

    // Interval×interval overlap join: two derived campaign calendars
    // (7-day HIGH windows × 10-day URGENT windows), emitting each
    // overlapping pair once with its exact overlap length. The canonical-
    // bin trick makes the equijoin exactly-once with no dedup pass; bin
    // width = 7 days keeps the explosion at ≤ 2 bins per left / ≤ 3 per
    // right interval. Oracle = the naive overlap predicate join.
    "q120_overlap_join" -> ((s, d) => {
      def windows(prio: String, mod: Int, days: Int,
          idc: String, loc: String, hic: String): DataFrame =
        Tables.orders(s, d)
          .filter(col("o_orderpriority") === prio &&
            pmod(col("o_orderkey"), lit(mod)) === lit(0))
          .select(col("o_orderkey").as(idc),
            unix_timestamp(col("o_orderdate")).as(loc),
            (unix_timestamp(col("o_orderdate")) + lit(days * 86400L)).as(hic))
      val a = windows("2-HIGH", 11, 7, "a_id", "a_lo", "a_hi")
      val b = windows("1-URGENT", 13, 10, "b_id", "b_lo", "b_hi")
      intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi",
        binWidth = 7L * 86400L)
        .select(col("a_id"), col("b_id"),
          (least(col("a_hi"), col("b_hi")) -
            greatest(col("a_lo"), col("b_lo"))).as("overlap_s"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // The NAIVE form of the band join — exactly what a user writes, NO
    // library call: `points.join(intervals, x >= lo && x < hi)`. The
    // graft.plans.BandJoinRewrite optimizer rule detects the pure band
    // predicate, derives the bin width from the structural span
    // (hi = lo + 4 days here), and rewrites to the q118 bin-equijoin
    // shape — zero BNLJ/cartesian (PlanAuditSpec pins it). With the
    // rule disabled the same code still returns identical rows through
    // Spark's nested-loop plan (the rule-off sweep), so the rewrite is
    // a pure plan transformation, never a semantics change.
    "q140_band_join_auto" -> ((s, d) => {
      val camp = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "3-MEDIUM" &&
          pmod(col("o_orderkey"), lit(5)) === lit(0))
        .select(col("o_orderkey").as("camp_id"),
          unix_timestamp(col("o_orderdate")).as("lo"),
          (unix_timestamp(col("o_orderdate")) + lit(4L * 86400L)).as("hi"))
      // spread on the POINT side only (the rewrite samples/pattern-walks
      // the interval side; a Repartition there would defeat
      // cheapToSample) — still the naive join, just a full-width scan
      val pts = Tables.spread(Tables.lineitem(s, d)
        .select(unix_timestamp(col("l_shipdate")).as("x"), col("l_quantity")))
      pts.join(camp, col("x") >= col("lo") && col("x") < col("hi"))
        .groupBy(col("camp_id"))
        .agg(count(lit(1)).as("n_shipped"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("camp_id"))
    }),

    // The NAIVE form of the interval-OVERLAP join — q120's shape with
    // no library call: `a.join(b, a_lo < b_hi && b_lo < a_hi)`. The
    // optimizer rule's two-sided pattern fires (width = the smaller
    // structural span), normalizing each side to its unordered range so
    // the rewrite reproduces the naive predicate's semantics exactly
    // (including empty/inverted intervals — spec-pinned hostile cases);
    // exactly-once by the canonical shared bin. Oracle = the naive
    // overlap predicate join in DuckDB.
    // The NAIVE range-EXISTS shape — a LEFT SEMI band join with no
    // library call: "lineitems shipped inside ANY active 3-day HIGH
    // campaign window". The optimizer rule's semi orientation fires
    // (the point side is the semi's output side; the interval side may
    // explode freely because semi only tests match-existence), so the
    // plan is a bin semi equijoin, zero BNLJ (PlanAuditSpec pins it).
    // Oracle = the naive EXISTS predicate in DuckDB.
    "q143_band_semi" -> ((s, d) => {
      val camp = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "2-HIGH" &&
          pmod(col("o_orderkey"), lit(6)) === lit(0))
        .select(unix_timestamp(col("o_orderdate")).as("lo"),
          (unix_timestamp(col("o_orderdate")) + lit(3L * 86400L)).as("hi"))
      // (round-17: spreading this scan was tried and measured slower —
      // the semi probe emits each point at most once, so the per-row
      // work is too small to amortize the widening exchange)
      val pts = Tables.lineitem(s, d)
        .select(unix_timestamp(col("l_shipdate")).as("x"),
          col("l_returnflag"), col("l_quantity"))
      pts.join(camp, col("x") >= col("lo") && col("x") < col("hi"),
          "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_in_window"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // The NAIVE band join over FREE-FORM intervals — hi is data-derived
    // (1..5 days per campaign), so there is NO structural span and NO
    // configured width: the rewrite's planning-time sampled width
    // (max(hi − lo) over a bounded scan of the interval side) is what
    // rescues this shape from the nested loop. Same oracle discipline
    // as q140; the rewrites_off sweep re-proves rows through the naive
    // plan.
    "q144_band_sampled" -> ((s, d) => {
      val camp = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "5-LOW" &&
          pmod(col("o_orderkey"), lit(8)) === lit(0))
        .select(col("o_orderkey").as("camp_id"),
          unix_timestamp(col("o_orderdate")).as("lo"),
          (unix_timestamp(col("o_orderdate")) +
            (lit(1L) + pmod(col("o_orderkey"), lit(5L))) * lit(86400L))
            .as("hi"))
      val pts = Tables.spread(Tables.lineitem(s, d)
        .select(unix_timestamp(col("l_shipdate")).as("x"),
          col("l_quantity")))
      pts.join(camp, col("x") >= col("lo") && col("x") < col("hi"))
        .groupBy(col("camp_id"))
        .agg(count(lit(1)).as("n_shipped"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("camp_id"))
    }),

    // The naive DATE-range band join — `d >= lo AND d < hi` on DATE
    // columns, the single most common band shape in a warehouse. Both
    // bounds are DateType (days-since-epoch internally), so the rewrite
    // bins on the exact day integer; the structural span comes from the
    // date_add arithmetic (4 DAYS), scaled to the DAY unit the dates
    // bin in — not the µs/seconds a timestamp band would use (the
    // TimestampAddInterval unit lesson, now per-arithmetic). Before
    // round 15 this shape silently planned BroadcastNestedLoopJoin
    // (PlanAuditSpec pins zero BNLJ now); the rewrites_off sweep
    // re-proves the rows through the naive plan.
    "q147_band_date" -> ((s, d) => {
      val camp = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "4-NOT SPECIFIED" &&
          pmod(col("o_orderkey"), lit(7)) === lit(0))
        .select(col("o_orderkey").as("camp_id"),
          to_date(col("o_orderdate")).as("lo"),
          date_add(to_date(col("o_orderdate")), 4).as("hi"))
      val pts = Tables.spread(Tables.lineitem(s, d)
        .select(to_date(col("l_shipdate")).as("d"), col("l_quantity")))
      pts.join(camp, col("d") >= col("lo") && col("d") < col("hi"))
        .groupBy(col("camp_id"))
        .agg(count(lit(1)).as("n_shipped"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("camp_id"))
    }),

    // The naive overlap join over STORED (data-derived) bounds — no
    // structural span on either side and no configured width: the
    // per-side planning-time samples (max unordered span of each side,
    // min of the two) supply the width, so the shape escapes the
    // nested loop exactly as q144 does for one-sided bands (round-16
    // parity: before it, this silently planned BNLJ). Spans are
    // data-dependent (1..4 days × 2..6 days); the rewrites_off sweep
    // re-proves the rows through the naive plan.
    "q150_overlap_stored" -> ((s, d) => {
      def windows(prio: String, mod: Int, base: Int, spanMod: Int,
          idc: String, loc: String, hic: String): DataFrame =
        Tables.orders(s, d)
          .filter(col("o_orderpriority") === prio &&
            pmod(col("o_orderkey"), lit(mod)) === lit(0))
          .select(col("o_orderkey").as(idc),
            unix_timestamp(col("o_orderdate")).as(loc),
            (unix_timestamp(col("o_orderdate")) +
              (lit(base.toLong) + pmod(col("o_orderkey"), lit(spanMod.toLong)))
                * lit(86400L)).as(hic))
      val a = windows("5-LOW", 12, 1, 4, "a_id", "a_lo", "a_hi")
      val b = windows("1-URGENT", 14, 2, 5, "b_id", "b_lo", "b_hi")
      a.join(b, col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
        .select(col("a_id"), col("b_id"),
          (least(col("a_hi"), col("b_hi")) -
            greatest(col("a_lo"), col("b_lo"))).as("overlap_s"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // The naive DECIMAL band join — a price band `x >= lo AND x < hi`
    // on DECIMAL(p,2) money columns, derived exactly from integer keys
    // (never from doubles: a double→decimal cast rounds, and two
    // engines' rounding needn't agree). Decimals bin exactly on their
    // unscaled long at the band's widest scale; the structural span
    // comes from the decimal Add (`hi = lo + 0.05` → width 5 unscaled
    // units). Before round 16 this shape silently planned
    // BroadcastNestedLoopJoin (PlanAuditSpec pins zero BNLJ now); the
    // rewrites_off sweep re-proves the rows through the naive plan.
    "q151_band_decimal" -> ((s, d) => {
      val bands = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "2-HIGH" &&
          pmod(col("o_orderkey"), lit(16)) === lit(0))
        .select(col("o_orderkey").as("band_id"),
          (pmod(col("o_orderkey"), lit(100000L)).cast("decimal(10,0)")
            * lit(BigDecimal("0.01"))).as("lo"))
        .select(col("band_id"), col("lo"),
          (col("lo") + lit(BigDecimal("0.05"))).as("hi"))
      // (round-17: spreading this scan was tried and measured slower —
      // the 0.05-wide bands match few points, so the probe is too cheap
      // to amortize the widening exchange)
      val pts = Tables.lineitem(s, d)
        .select((pmod(col("l_orderkey") * 7 + col("l_suppkey"),
            lit(100000L)).cast("decimal(10,0)")
            * lit(BigDecimal("0.01"))).as("x"),
          col("l_quantity"))
      pts.join(bands, col("x") >= col("lo") && col("x") < col("hi"))
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n_in_band"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("band_id"))
    }),

    "q142_overlap_auto" -> ((s, d) => {
      def windows(prio: String, mod: Int, days: Int,
          idc: String, loc: String, hic: String): DataFrame =
        Tables.orders(s, d)
          .filter(col("o_orderpriority") === prio &&
            pmod(col("o_orderkey"), lit(mod)) === lit(0))
          .select(col("o_orderkey").as(idc),
            unix_timestamp(col("o_orderdate")).as(loc),
            (unix_timestamp(col("o_orderdate")) + lit(days * 86400L)).as(hic))
      val a = windows("2-HIGH", 9, 6, "a_id", "a_lo", "a_hi")
      val b = windows("3-MEDIUM", 10, 9, "b_id", "b_lo", "b_hi")
      a.join(b, col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
        .select(col("a_id"), col("b_id"),
          (least(col("a_hi"), col("b_hi")) -
            greatest(col("a_lo"), col("b_lo"))).as("overlap_s"))
        .orderBy(col("a_id"), col("b_id"))
    }))

  def oracle: Map[String, String] = Map(
    "q118_interval_join" ->
      s"""WITH camp AS (
           SELECT o_orderkey AS camp_id, o_orderdate AS lo,
             o_orderdate + INTERVAL 5 DAY AS hi
           FROM orders
           WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 7 = 0)
         SELECT camp_id, count(*) AS n_shipped,
           ${sqlDsum("l_quantity")} AS sum_qty
         FROM lineitem JOIN camp ON l_shipdate >= lo AND l_shipdate < hi
         GROUP BY camp_id ORDER BY camp_id""",

    "q120_overlap_join" ->
      """WITH a AS (
           SELECT o_orderkey AS a_id, o_orderdate AS a_lo,
             o_orderdate + INTERVAL 7 DAY AS a_hi
           FROM orders
           WHERE o_orderpriority = '2-HIGH' AND o_orderkey % 11 = 0),
         b AS (
           SELECT o_orderkey AS b_id, o_orderdate AS b_lo,
             o_orderdate + INTERVAL 10 DAY AS b_hi
           FROM orders
           WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 13 = 0)
         SELECT a_id, b_id,
           date_diff('second', greatest(a_lo, b_lo), least(a_hi, b_hi))
             AS overlap_s
         FROM a JOIN b ON a_lo < b_hi AND b_lo < a_hi
         ORDER BY a_id, b_id""",

    "q140_band_join_auto" ->
      s"""WITH camp AS (
           SELECT o_orderkey AS camp_id, o_orderdate AS lo,
             o_orderdate + INTERVAL 4 DAY AS hi
           FROM orders
           WHERE o_orderpriority = '3-MEDIUM' AND o_orderkey % 5 = 0)
         SELECT camp_id, count(*) AS n_shipped,
           ${sqlDsum("l_quantity")} AS sum_qty
         FROM lineitem JOIN camp ON l_shipdate >= lo AND l_shipdate < hi
         GROUP BY camp_id ORDER BY camp_id""",

    "q143_band_semi" ->
      s"""SELECT l_returnflag, count(*) AS n_in_window,
           ${sqlDsum("l_quantity")} AS sum_qty
         FROM lineitem
         WHERE EXISTS (
           SELECT 1 FROM orders
           WHERE o_orderpriority = '2-HIGH' AND o_orderkey % 6 = 0
             AND l_shipdate >= o_orderdate
             AND l_shipdate < o_orderdate + INTERVAL 3 DAY)
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q144_band_sampled" ->
      s"""WITH camp AS (
           SELECT o_orderkey AS camp_id, o_orderdate AS lo,
             o_orderdate + (1 + o_orderkey % 5) * INTERVAL 1 DAY AS hi
           FROM orders
           WHERE o_orderpriority = '5-LOW' AND o_orderkey % 8 = 0)
         SELECT camp_id, count(*) AS n_shipped,
           ${sqlDsum("l_quantity")} AS sum_qty
         FROM lineitem JOIN camp ON l_shipdate >= lo AND l_shipdate < hi
         GROUP BY camp_id ORDER BY camp_id""",

    "q147_band_date" ->
      s"""WITH camp AS (
           SELECT o_orderkey AS camp_id, CAST(o_orderdate AS DATE) AS lo,
             CAST(o_orderdate AS DATE) + 4 AS hi
           FROM orders
           WHERE o_orderpriority = '4-NOT SPECIFIED' AND o_orderkey % 7 = 0)
         SELECT camp_id, count(*) AS n_shipped,
           ${sqlDsum("l_quantity")} AS sum_qty
         FROM lineitem JOIN camp
           ON CAST(l_shipdate AS DATE) >= lo
           AND CAST(l_shipdate AS DATE) < hi
         GROUP BY camp_id ORDER BY camp_id""",

    "q150_overlap_stored" ->
      """WITH a AS (
           SELECT o_orderkey AS a_id, o_orderdate AS a_lo,
             o_orderdate + (1 + o_orderkey % 4) * INTERVAL 1 DAY AS a_hi
           FROM orders
           WHERE o_orderpriority = '5-LOW' AND o_orderkey % 12 = 0),
         b AS (
           SELECT o_orderkey AS b_id, o_orderdate AS b_lo,
             o_orderdate + (2 + o_orderkey % 5) * INTERVAL 1 DAY AS b_hi
           FROM orders
           WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 14 = 0)
         SELECT a_id, b_id,
           date_diff('second', greatest(a_lo, b_lo), least(a_hi, b_hi))
             AS overlap_s
         FROM a JOIN b ON a_lo < b_hi AND b_lo < a_hi
         ORDER BY a_id, b_id""",

    "q151_band_decimal" ->
      s"""WITH bands AS (
           SELECT o_orderkey AS band_id,
             CAST(o_orderkey % 100000 AS DECIMAL(10,0)) * 0.01 AS lo,
             CAST(o_orderkey % 100000 AS DECIMAL(10,0)) * 0.01 + 0.05 AS hi
           FROM orders
           WHERE o_orderpriority = '2-HIGH' AND o_orderkey % 16 = 0),
         pts AS (
           SELECT CAST((l_orderkey * 7 + l_suppkey) % 100000
               AS DECIMAL(10,0)) * 0.01 AS x, l_quantity
           FROM lineitem)
         SELECT band_id, count(*) AS n_in_band,
           ${sqlDsum("l_quantity")} AS sum_qty
         FROM pts JOIN bands ON x >= lo AND x < hi
         GROUP BY band_id ORDER BY band_id""",

    "q142_overlap_auto" ->
      """WITH a AS (
           SELECT o_orderkey AS a_id, o_orderdate AS a_lo,
             o_orderdate + INTERVAL 6 DAY AS a_hi
           FROM orders
           WHERE o_orderpriority = '2-HIGH' AND o_orderkey % 9 = 0),
         b AS (
           SELECT o_orderkey AS b_id, o_orderdate AS b_lo,
             o_orderdate + INTERVAL 9 DAY AS b_hi
           FROM orders
           WHERE o_orderpriority = '3-MEDIUM' AND o_orderkey % 10 = 0)
         SELECT a_id, b_id,
           date_diff('second', greatest(a_lo, b_lo), least(a_hi, b_hi))
             AS overlap_s
         FROM a JOIN b ON a_lo < b_hi AND b_lo < a_hi
         ORDER BY a_id, b_id""")
}
