package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.Exact._

/** Sketch-based and multi-grouping aggregation operators (SURVEY.md §2.4
  * extensions, round 3) — the approximate/mergeable-aggregate tier a 100 TB
  * pipeline uses where exact distinct/quantile computation would shuffle
  * the full key set:
  *
  *  - GROUPING SETS (beyond rollup/cube: an explicit set list compiles to
  *    ONE Expand + one shuffle, not one job per set);
  *  - HyperLogLog distinct-count sketches (Apache DataSketches HLL via
  *    `hll_sketch_agg`): per-shard sketches are MERGEABLE — the two-level
  *    plan (shard→sketch, union→estimate) is exactly how distinct counts
  *    roll up across 1000 executors / daily partitions without ever
  *    shuffling raw keys;
  *  - quantile sketches (`percentile_approx`, Greenwald-Khanna): rank-error
  *    bounded percentiles in one pass, vs the exact sort-based form;
  *  - Bloom-filter join pruning: build a compact membership sketch of the
  *    small side's keys, semi-filter the fact scan BEFORE the shuffle —
  *    Spark's own runtime row-level filtering does this automatically when
  *    thresholds allow; the explicit form here works at any threshold and
  *    pins the semantics (no false negatives ⇒ result identical to the
  *    plain join after the exact join re-checks candidates).
  *
  * Oracle strategy for approximate results: the DuckDB oracle cannot
  * reproduce sketch internals, so each approximate value is exported as a
  * BOOLEAN "within tolerance of exact" next to the exact value computed in
  * the same query; the oracle asserts the exact value and `true`. A sketch
  * that drifts out of tolerance fails the hash-match — the check is real.
  */
object SketchOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Explicit GROUPING SETS (§2.4): three set shapes in one Expand pass —
    // (flag, status), (flag), () — distinguishable by the NULL pattern
    // (both columns are non-null in the data).
    "q60_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))
    }),

    // Two-level mergeable HLL: per-nation customer sketches → union to the
    // region level → estimate, next to the exact distinct count. At scale
    // the sketch path shuffles ~1.5 KB per nation instead of every custkey;
    // the exact path here exists to *verify* the estimate (5% tolerance —
    // HLL lgConfigK=12 has ~1.6% standard error).
    "q61_hll_distinct" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_regionkey"))
      val r = Tables.region(s, d).select(col("r_regionkey"), col("r_name"))
      val keyed = c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      // level 1: one sketch per nation (the "per-shard" aggregate)
      val perNation = keyed.groupBy(col("n_regionkey").as("rk"), col("c_nationkey"))
        .agg(hll_sketch_agg(col("c_custkey"), lit(12)).as("sk"))
      // level 2: merge shard sketches per region — no raw keys move
      val est = perNation.groupBy(col("rk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_est"))
      val exact = keyed.groupBy(col("n_regionkey"))
        .agg(countDistinct(col("c_custkey")).as("n_exact"))
      exact.join(est, col("n_regionkey") === col("rk"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_exact"),
          (abs(col("n_est") - col("n_exact")) <=
            col("n_exact") * lit(0.05)).as("hll_ok"))
        .orderBy(col("r_name"))
    }),

    // Quantile sketch vs exact percentiles: one-pass GK sketch
    // (percentile_approx) checked against the exact *discrete* percentile
    // at 1% relative tolerance. The exact side is `Exact.percentileDisc`
    // (SQL-standard percentile_disc, distributed: value-level counts with
    // map-side combine, then a cumulative window over the DISTINCT-value
    // set only) — the built-in `percentile_disc` buffers every raw value
    // of a group in one aggregator's memory, which is exactly the
    // single-node collapse a 100 TB group cannot afford. Equivalence with
    // the built-in is pinned by ExactPercentileSpec. The output columns are
    // raw DOUBLE data elements (a discrete percentile IS a member of the
    // column) — no rounding/decimal layer between Spark and the oracle, so
    // the hash compare is bit-exact by construction.
    "q62_quantile_sketch" -> ((s, d) => {
      // (round-17 note: spreading the scan was tried and measured SLOWER
      // — the cost here is the per-returnflag cumulative window over the
      // ~600k distinct values, whose parallelism is bounded by the group
      // count, not by the scan width)
      val exact = percentileDisc(
        Tables.lineitem(s, d), col("l_returnflag"), col("l_extendedprice"),
        Map("p50" -> 0.5, "p99" -> 0.99))
      val approx = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("rf"))
        .agg(expr("percentile_approx(l_extendedprice, array(0.5, 0.99), 10000)").as("aq"))
        .select(col("rf"), element_at(col("aq"), 1).as("a50"),
          element_at(col("aq"), 2).as("a99"))
      exact.join(approx, col("l_returnflag") === col("rf"))
        .select(col("l_returnflag"), col("p50"), col("p99"),
          (abs(col("a50") - col("p50")) <= col("p50") * 0.01).as("p50_ok"),
          (abs(col("a99") - col("p99")) <= col("p99") * 0.01).as("p99_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // Bloom-filter join pruning: membership sketch of the (filtered) small
    // side's join keys applied at the fact scan, so non-matching rows are
    // dropped BEFORE the join shuffle — the explicit form of runtime
    // row-level filtering / DPP. False positives are removed by the exact
    // join that follows; false negatives don't exist, so the result is
    // bit-identical to the plain join (which is what the oracle runs).
    // Count-Min-Sketch heavy hitters: a fixed-size frequency sketch over
    // the full key stream, probed for the exact top-10 keys. CMS counters
    // are additive, so per-partition sketches merge without shuffling raw
    // keys (the same mergeability story as the HLL in q61) — at 100 TB the
    // sketch is KBs-per-executor while the exact groupBy ships every key.
    // With a fixed seed the merged counters are partition-order-invariant,
    // so the estimate is deterministic; CMS never underestimates, and the
    // sketch's own guarantee bounds the overestimate: est <= actual + eps*N
    // (eps = the relativeError passed to countMinSketch, N = total stream
    // length) with probability `confidence`. The oracle-checked boolean
    // pins exactly those two bounds — with the slack DERIVED from eps*N,
    // not a constant, so it holds at every scale factor, not just the
    // fixture (a constant slack of 5 would flip false once eps*N > 5,
    // i.e. orders > 500k rows).
    "q70_cms_heavy_hitters" -> ((s, d) => {
      val eps = 0.00001
      val cms = Tables.orders(s, d).select(col("o_custkey"))
        .stat.countMinSketch("o_custkey", eps, 0.999, 42)
      val cmsB = s.sparkContext.broadcast(cms)
      val est = udf((k: Long) => cmsB.value.estimateCount(k))
      val slack = math.ceil(eps * cms.totalCount()).toLong
      Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("o_custkey"))
        .limit(10)
        .withColumn("cms_est", est(col("o_custkey")))
        .select(col("o_custkey"), col("n_orders"),
          (col("cms_est") >= col("n_orders") &&
            col("cms_est") <= col("n_orders") + lit(slack)).as("cms_ok"))
        .orderBy(col("n_orders").desc, col("o_custkey"))
    }),

    "q63_bloom_join" -> ((s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      val bloom = urgent.stat.bloomFilter("o_orderkey", 100000L, 0.01)
      val bloomB = s.sparkContext.broadcast(bloom)
      val mightMatch = udf((k: Long) => bloomB.value.mightContainLong(k))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"))
        .filter(mightMatch(col("l_orderkey"))) // sketch prune at the scan
        .join(urgent, col("l_orderkey") === col("o_orderkey")) // exact re-check
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"),
          countDistinct(col("l_orderkey")).as("n_orders"))
    }))

  def oracle: Map[String, String] = Map(
    "q60_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
         ${sqlDsum("l_quantity")} AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
           (l_returnflag), ())
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q61_hll_distinct" ->
      """SELECT r_name, count(DISTINCT c_custkey) AS n_exact, true AS hll_ok
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",

    "q62_quantile_sketch" ->
      """SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.5) AS p50,
           quantile_disc(l_extendedprice, 0.99) AS p99,
           true AS p50_ok, true AS p99_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q63_bloom_join" ->
      s"""SELECT count(*) AS n_items, ${sqlDsum("l_quantity")} AS sum_qty,
         count(DISTINCT l_orderkey) AS n_orders
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT'""",

    "q70_cms_heavy_hitters" ->
      """SELECT o_custkey, count(*) AS n_orders, true AS cms_ok
         FROM orders GROUP BY o_custkey
         ORDER BY n_orders DESC, o_custkey LIMIT 10""")
}
