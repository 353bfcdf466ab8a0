package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.functions.Exact._

/** Analytic-window, subquery, and CDC-shape operators (round 4): the
  * remaining relational surface a warehouse user expects beyond the
  * §2.2-§2.7 spine — distribution ranks (ntile/percent_rank/cume_dist),
  * EXISTS/IN and scalar subqueries through the SQL surface (exercising
  * Catalyst's RewritePredicateSubquery / scalar-subquery planning), an
  * SCD2 validity-interval build (the changelog→snapshot materialization
  * every CDC pipeline runs), and explicit two-phase (salted) aggregation
  * for hot grouping keys.
  *
  * Determinism notes: every window order carries a unique tiebreak column,
  * so rank-family outputs are total-order stable; percent_rank/cume_dist
  * emit RAW doubles — both engines compute the same small-integer division
  * on identical ranks, so the doubles are bit-identical (no rounding
  * needed, and rounding itself would be the riskier cross-engine op).
  */
object Analytic {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Distribution ranks per segment: ntile buckets for stratification,
    // percent_rank/cume_dist for score normalization. One shuffle on the
    // partition key; at 100 TB this is the standard feature-scaling pass
    // (each segment's window sorts locally after the hash exchange).
    "q65_ntile_ranks" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    }),

    // EXISTS + IN predicate subqueries via the SQL surface. Catalyst
    // rewrites both to left-semi joins (RewritePredicateSubquery) — the
    // same physical plan as q04, reached from SQL instead of the
    // DataFrame API. The IN list (nation) broadcasts.
    "q66_exists_subquery" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """SELECT s_suppkey, s_name FROM supplier
           WHERE EXISTS (SELECT 1 FROM lineitem
                         WHERE l_suppkey = s_suppkey AND l_quantity > 49)
             AND s_nationkey IN (SELECT n_nationkey FROM nation
                                 WHERE n_regionkey = 1)
           ORDER BY s_suppkey""")
    }),

    // Scalar subqueries: one uncorrelated (global max, computed once and
    // broadcast as a literal) and one correlated (per-order min, planned
    // as an aggregate + left outer join). min/max over doubles are
    // order-independent, so both are engine-exact.
    "q67_scalar_subquery" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """SELECT o_orderstatus, count(*) AS n_orders
           FROM orders
           WHERE o_totalprice < (SELECT max(o_totalprice) FROM orders)
             AND o_totalprice > 2 * (SELECT min(l_extendedprice)
                                     FROM lineitem
                                     WHERE l_orderkey = o_orderkey)
           GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    }),

    // SCD2 validity intervals from a changelog: each order's effective
    // window runs until the customer's next order (lead), the last one is
    // open-ended (is_current). This is the changelog→slowly-changing-
    // dimension materialization; one shuffle on the entity key, then a
    // per-key sort — the same shape at any scale.
    "q68_scd2_intervals" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("valid_from"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").as("valid_from"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy(col("o_custkey"), col("valid_from"), col("o_orderkey"))
    }),

    // Explicit two-phase (salted) aggregation: phase 1 aggregates on
    // (key, salt) — 16 partial rows per key, evenly spread — phase 2
    // merges partials on the key alone. The map-side combine Spark already
    // does handles most skew; the explicit salt is the tool when ONE
    // grouping key dominates entire partitions (a hot l_returnflag here,
    // stand-in for e.g. one giant tenant). Partials stay DECIMAL until the
    // final merge, so the result is bit-equal to the plain aggregation —
    // which is exactly what the oracle runs.
    "q69_two_phase_agg" -> ((s, d) => {
      val partials = Tables.lineitem(s, d)
        .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(count(lit(1)).as("pn"), sum(dec(col("l_quantity"))).as("pq"))
      partials.groupBy(col("l_returnflag"))
        .agg(sum(col("pn")).as("n_rows"),
          sum(col("pq")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }))

  def oracle: Map[String, String] = Map(
    "q65_ntile_ranks" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal, c_custkey)
         ORDER BY c_mktsegment, c_custkey""",

    "q66_exists_subquery" ->
      """SELECT s_suppkey, s_name FROM supplier
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_suppkey = s_suppkey AND l_quantity > 49)
           AND s_nationkey IN (SELECT n_nationkey FROM nation
                               WHERE n_regionkey = 1)
         ORDER BY s_suppkey""",

    "q67_scalar_subquery" ->
      """SELECT o_orderstatus, count(*) AS n_orders
         FROM orders
         WHERE o_totalprice < (SELECT max(o_totalprice) FROM orders)
           AND o_totalprice > 2 * (SELECT min(l_extendedprice)
                                   FROM lineitem
                                   WHERE l_orderkey = o_orderkey)
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q68_scd2_intervals" ->
      """SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
           lead(o_orderdate) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS valid_to,
           lead(o_orderdate) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
         FROM orders ORDER BY o_custkey, valid_from, o_orderkey""",

    "q69_two_phase_agg" ->
      s"""SELECT l_returnflag, count(*) AS n_rows,
         ${sqlDsum("l_quantity")} AS sum_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
}
