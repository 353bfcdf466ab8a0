package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables
import graft.functions.Exact._

/** Relational spine over the TPC-H-ish star schema (SURVEY.md §2.2-§2.7,
  * §7.3 step 2). Every query is a declarative DataFrame plan — filters and
  * projections reach the parquet scan, joins pick broadcast vs shuffle via
  * Catalyst + AQE, and double aggregates use exact decimal arithmetic
  * ([[graft.functions.Exact]]) so results are partition-order-independent
  * (a correctness requirement for the DuckDB oracle AND for reproducibility
  * on a real cluster).
  *
  * Scale notes per query are in each query's comment.
  */
object Relational {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1-style full-scan aggregation. At 100 TB this is a pure map-side
    // partial agg + tiny shuffle (4 groups); decimal agg stays in WSCG.
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
            .cast("double").as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Selective scan: both predicates + the 4-column projection are pushed
    // into the parquet reader (verify via .explain → PushedFilters).
    "q02_filter_pushdown" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
                col("l_quantity") > 30)
        .select(col("l_orderkey"), col("l_linenumber"),
                col("l_extendedprice"), col("l_shipdate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // 4-way star join. nation (25 rows) and customer (dim) broadcast; the
    // lineitem⋈orders fact join shuffles on orderkey — at 100 TB that is
    // the one unavoidable shuffle, minimized by pre-aggregating nothing
    // (revenue needs row-level discount) but projecting only 3 columns.
    "q03_revenue_by_nation" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // EXISTS → left-semi join: never materializes the probe side's payload,
    // and the build side is distinct-orderkey only.
    "q04_semi_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val bigLines = Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45).select(col("l_orderkey"))
      o.join(bigLines, o("o_orderkey") === bigLines("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),

    // NOT EXISTS → left-anti join.
    "q05_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // TPC-H Q6 shape: fully-pushed predicates, single scalar out.
    "q06_forecast_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // Ranking window: top-3 orders per customer. Shuffles once on custkey.
    "q07_window_topn" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn").cast("long").as("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Top-5 lineitems per supplier through the NATIVE TopKPerKey plan
    // (graft/plans/TopKPerKey.scala — custom LogicalPlan + Strategy +
    // SparkPlan): same output contract as q07's row_number window, but
    // the pre-exchange partial take-k bounds the shuffle at k rows per
    // (supplier, task). Oracle is the plain window SQL — pins that the
    // whole-operator plan is result-identical to the built-in form.
    "q116_native_topk" -> ((s, d) => {
      val slim = Tables.lineitem(s, d).select(col("l_suppkey"),
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      graft.plans.TopKPerKey(slim, Seq("l_suppkey"),
        Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")),
        k = 5)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("rn").cast("long").as("rn"))
        .orderBy(col("l_suppkey"), col("rn"))
    }),

    // Running (prefix) aggregate per key — decimal-exact so the frame sum
    // is reproducible.
    "q08_running_total" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_spend", sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    // Global top-k: Spark plans TakeOrderedAndProject — per-partition heap
    // + single k-row merge at the driver; no full sort at any scale.
    "q09_global_topk" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
    }),

    "q10_distinct" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_mktsegment")).distinct()
        .orderBy(col("c_mktsegment"))),

    "q11_union" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.union(sup).distinct().orderBy(col("nationkey"))
    }),

    "q12_intersect" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.intersect(sup).orderBy(col("nationkey"))
    }),

    "q13_except" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.except(sup).orderBy(col("nationkey"))
    }),

    // ROLLUP — grouping-set aggregation, one shuffle, expand handled by
    // Catalyst's Expand operator.
    "q14_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    // Conditional (pivot-style) aggregation in one pass.
    "q15_conditional_agg" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("l_linestatus") === "F", dec(col("l_quantity")))
            .otherwise(dec(lit(0)))).cast("double").as("qty_f"),
          sum(when(col("l_linestatus") === "O", dec(col("l_quantity")))
            .otherwise(dec(lit(0)))).cast("double").as("qty_o"),
          count(when(col("l_discount") > 0.05, lit(1))).as("n_discounted"))
        .orderBy(col("l_returnflag"))
    }),

    // Distinct aggregate after a broadcast dim join.
    "q16_distinct_agg" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
      val p = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("p_brand"))
    }),

    // CUBE — all grouping-set combinations (§2.4); same single-shuffle
    // Expand plan as rollup.
    "q38_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))
    }),

    // PIVOT — long→wide reshaping; Spark's pivot plans as a single
    // conditional aggregation pass (values enumerated up front, so no
    // second job to discover them).
    "q39_pivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
        .na.fill(0.0, Seq("F", "O"))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy(col("l_returnflag"))
    }),

    // Equi + range join: ship within 30 days of the order date. The equi
    // key carries the shuffle; the range predicate is a post-join filter,
    // so this scales like a plain orderkey join.
    // Skew-salted fact⋈fact join, oracle-checked against the PLAIN SQL
    // join: salting must be invisible in the result set (every small-side
    // key is replicated to all salt values; the salt only reshapes the
    // shuffle). This pins the rewrite's semantics, not just its plan —
    // the tool for hot keys beyond AQE's skew handling when neither side
    // broadcasts.
    "q59_salted_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
      Skew.saltedJoin(li, ord, "l_orderkey", "o_orderkey", 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    }),

    "q17_range_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"))
      li.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_shipped_30d"))
        .orderBy(col("o_orderstatus"))
    }),

    // TPC-H Q5 shape (round 5): the 6-table local-supplier star — the
    // deepest join tree in the inventory. Join discipline for 100 TB: the
    // two FACTS (lineitem ⋈ date-filtered orders) shuffle on the orderkey
    // ONCE; every dimension (customer, supplier, nation, region) is
    // broadcast, including the theta-ish "local supplier" condition
    // c_nationkey = s_nationkey which rides the supplier broadcast join
    // instead of forcing a second fact shuffle. The date filter sits
    // directly on the orders scan (parquet pushdown prunes row groups).
    "q86_local_supplier_revenue" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      val n = Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_regionkey"), col("n_name"))
      val r = Tables.region(s, d)
        .filter(col("r_name") === "ASIA").select(col("r_regionkey"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }))

  def oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         ${sqlDsum("l_quantity")} AS sum_qty,
         ${sqlDsum("l_extendedprice")} AS sum_base_price,
         ${sqlDsumProd("l_extendedprice", "1 - l_discount")} AS sum_disc_price,
         ${sqlDavg("l_quantity")} AS avg_qty,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate <  TIMESTAMP '1997-01-01'
           AND l_quantity > 30
         ORDER BY l_orderkey, l_linenumber""",

    "q03_revenue_by_nation" ->
      s"""SELECT n_name,
         ${sqlDsumProd("l_extendedprice", "1 - l_discount")} AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey  = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         GROUP BY n_name
         ORDER BY revenue DESC, n_name""",

    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders
         FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity > 45)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",

    "q06_forecast_revenue" ->
      s"""SELECT ${sqlDsumProd("l_extendedprice", "l_discount")} AS revenue,
         count(*) AS n_rows
         FROM lineitem
         WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",

    "q07_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "q116_native_topk" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
           SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
           FROM lineitem) t
         WHERE rn <= 5 ORDER BY l_suppkey, rn""",

    "q08_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS VARCHAR) AS DOUBLE)
           AS running_spend
         FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""",

    "q09_global_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""",

    "q10_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",

    "q11_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
         UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""",

    "q12_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
         INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""",

    "q13_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
         EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""",

    "q14_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
         ${sqlDsum("l_quantity")} AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q15_conditional_agg" ->
      """SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'F'
             THEN CAST(l_quantity AS DECIMAL(18,4))
             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_f,
           CAST(sum(CASE WHEN l_linestatus = 'O'
             THEN CAST(l_quantity AS DECIMAL(18,4))
             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_o,
           count(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q16_distinct_agg" ->
      """SELECT p_brand, count(DISTINCT l_suppkey) AS n_suppliers,
           count(*) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",

    "q38_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
         ${sqlDsum("o_totalprice")} AS sum_price
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",

    "q39_pivot" ->
      s"""SELECT l_returnflag,
         coalesce(CAST(sum(CASE WHEN l_linestatus = 'F'
           THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE), 0) AS qty_f,
         coalesce(CAST(sum(CASE WHEN l_linestatus = 'O'
           THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE), 0) AS qty_o
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q17_range_join" ->
      """SELECT o_orderstatus, count(*) AS n_shipped_30d
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           AND l_shipdate >= o_orderdate
           AND l_shipdate < o_orderdate + INTERVAL 30 DAY
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q86_local_supplier_revenue" ->
      s"""SELECT n_name,
         ${sqlDsumProd("l_extendedprice", "1 - l_discount")} AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
           AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "q59_salted_join" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
         ${sqlDsum("l_quantity")} AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""")
}
