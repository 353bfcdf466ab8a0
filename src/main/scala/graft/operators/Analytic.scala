package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.functions.Exact._

/** Analytic-window, subquery, and CDC-shape operators (rounds 4-5): the
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
    }),

    // CDC MERGE/upsert (round 5): latest-version-wins compaction of a
    // changelog (insert snapshot + updates + deletes) into current state —
    // the batch form of what an idempotent foreachBatch sink does per
    // micro-batch. The changelog is synthesized deterministically from
    // orders (every 5th key updated, every 7th deleted); the merge is one
    // row_number window per key — a single shuffle at any scale, and the
    // standard shape for Delta/Iceberg-style MERGE INTO compaction.
    "q81_cdc_merge" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          lit(1L).as("version"), lit("I").as("op"))
      val upd = Tables.orders(s, d)
        .filter(pmod(col("o_orderkey"), lit(5)) === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") + lit(1000.0)).as("o_totalprice"),
          lit(2L).as("version"), lit("U").as("op"))
      val del = Tables.orders(s, d)
        .filter(pmod(col("o_orderkey"), lit(7)) === 0)
        .select(col("o_orderkey"), col("o_totalprice"),
          lit(3L).as("version"), lit("D").as("op"))
      val w = Window.partitionBy(col("o_orderkey"))
        .orderBy(col("version").desc)
      base.union(upd).union(del)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .select(col("o_orderkey"), col("o_totalprice"), col("op"))
        .orderBy(col("o_orderkey"))
    }),

    // Exact distributed dispersion statistics (round 5): sample stddev and
    // Pearson correlation from DECIMAL power sums (n, Σx, Σx², Σy, Σy²,
    // Σxy). Spark's built-in stddev/corr merge per-partition Welford
    // states in partition order — float results that can never hash-match
    // an oracle. Power sums in exact decimal are order-independent; each
    // is cast to double ONCE and the textbook formulas run in IEEE double
    // with the identical expression tree on both engines → bit-identical.
    // Same single-pass, map-side-combine plan as any groupBy aggregate.
    "q82_dispersion_stats" -> ((s, d) => {
      val x = dec(col("l_extendedprice"))
      val y = dec(col("l_quantity"))
      val agg = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(x).cast("double").as("sx"),
          sum(x * x).cast("double").as("sxx"),
          sum(y).cast("double").as("sy"),
          sum(y * y).cast("double").as("syy"),
          sum(x * y).cast("double").as("sxy"))
      val n = col("n_rows").cast("double")
      agg.select(col("l_returnflag"), col("n_rows"),
          (col("sx") / n).as("mean_price"),
          sqrt((n * col("sxx") - col("sx") * col("sx")) /
            (n * (n - lit(1.0)))).as("stddev_price"),
          ((n * col("sxy") - col("sx") * col("sy")) /
            sqrt((n * col("sxx") - col("sx") * col("sx")) *
              (n * col("syy") - col("sy") * col("sy"))))
            .as("corr_qty_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Equi-width histogram via width_bucket (round 5): 20 buckets over
    // [0, 500000) order totals — the one-pass distribution profile that
    // sizes range partitions / detects value skew before a big sort or
    // range join. Bucket boundaries are exact doubles (500000/20), so
    // bucket assignment is engine-exact; one tiny aggregation.
    "q83_price_histogram" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("bucket",
          width_bucket(col("o_totalprice"), lit(0.0), lit(500000.0), lit(20))
            .cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"))
        .withColumn("bucket_lo", ((col("bucket") - 1) * lit(25000)).cast("double"))
        .select(col("bucket"), col("bucket_lo"), col("n_orders"),
          col("sum_price"))
        .orderBy(col("bucket"))
    }),

    // Winsorization (round 5): clamp per-language doc lengths to the exact
    // [p05, p95] and report the trimmed mean — the robust-statistics pass
    // that keeps outlier documents from dominating curation thresholds.
    // The percentiles come from `Exact.percentileDisc` (distributed: never
    // materializes a group on one node), the per-lang cut table broadcasts
    // back onto the corpus, and the trimmed mean is an integer sum with
    // ONE final IEEE division — engine-exact end to end.
    "q93_winsorize" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("lang"), col("n_chars"))
      val cuts = percentileDisc(docs, col("lang"), col("n_chars"),
        Map("p05" -> 0.05, "p95" -> 0.95))
      docs.join(broadcast(cuts), "lang")
        .withColumn("clamped",
          greatest(least(col("n_chars"), col("p95")), col("p05")))
        .groupBy(col("lang"))
        .agg(min(col("p05")).as("p05"), min(col("p95")).as("p95"),
          count(lit(1)).as("n_docs"),
          (sum(col("clamped")).cast("double") / count(lit(1)))
            .as("mean_wins"))
        .orderBy(col("lang"))
    }),

    // Equi-depth (quantile) histogram (round 5): decile buckets over order
    // totals — the complement of q83's equi-width form, and the profile
    // that actually balances range partitions under value skew. The decile
    // boundaries come from the distributed exact percentile (NOT a global
    // ntile window, which would funnel every row through one partition's
    // sort); each row's bucket is then a broadcast compare against the
    // 9-value cut list, and the histogram is one hash aggregate.
    "q94_equidepth_histogram" -> ((s, d) => {
      val orders = Tables.orders(s, d)
        .select(col("o_totalprice"), lit(1).as("g"))
      val qs = (1 to 9).map(i => s"b$i" -> i / 10.0).toMap
      val cuts = percentileDisc(orders, col("g"), col("o_totalprice"), qs)
      val bucket = (1 to 9).map(i =>
        when(col("o_totalprice") > col(s"b$i"), 1L).otherwise(0L))
        .reduce(_ + _) + lit(1L)
      orders.join(broadcast(cuts), "g")
        .withColumn("bucket", bucket)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy(col("bucket"))
    }),

    // Join-key skew profile (round 5): the diagnostic behind every salting
    // / AQE-skew decision — per-key row counts bucketed by power-of-two
    // magnitude (bucket = bit width of the count, via the engine-exact
    // bin() string — no floating log2). Two aggregations, both with
    // map-side combine; the output is O(64) rows no matter the input
    // size, so this runs as a cheap pre-pass before any big join.
    "q95_skew_profile" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(length(bin(col("cnt"))).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("cnt")).cast("long").as("total_rows"),
          max(col("cnt")).as("max_cnt"))
        .orderBy(col("bucket"))
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
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q81_cdc_merge" ->
      """WITH log AS (
           SELECT o_orderkey, o_totalprice, 1 AS version, 'I' AS op
           FROM orders
           UNION ALL
           SELECT o_orderkey, o_totalprice + 1000.0, 2, 'U'
           FROM orders WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, o_totalprice, 3, 'D'
           FROM orders WHERE o_orderkey % 7 = 0),
         ranked AS (
           SELECT *, row_number() OVER (PARTITION BY o_orderkey
             ORDER BY version DESC) AS rn
           FROM log)
         SELECT o_orderkey, o_totalprice, op
         FROM ranked WHERE rn = 1 AND op <> 'D'
         ORDER BY o_orderkey""",

    // Two DuckDB-specific cast details, both needed for bit-equality:
    // (1) the first operand of each product is DECIMAL(28,4) — DuckDB sizes
    // a decimal product's storage from operand precisions (18+18 stays
    // int64-backed and overflows on price*price); 28+18 forces int128.
    // (2) decimal→double goes through VARCHAR: DuckDB's direct cast
    // double-rounds once the unscaled value exceeds 2^53 (int128→double,
    // then /10^scale), while Spark (Java BigDecimal) parses the decimal
    // string, which is correctly rounded — the string route makes DuckDB
    // correctly rounded too. A 1-ulp difference here would be amplified
    // ~1e3× by the cancellation in the corr numerator.
    "q82_dispersion_stats" ->
      """WITH a AS (
           SELECT l_returnflag, count(*) AS n_rows,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
               AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))
               * CAST(l_extendedprice AS DECIMAL(18,4)))
               AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4)))
               AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,4))
               * CAST(l_quantity AS DECIMAL(18,4)))
               AS VARCHAR) AS DOUBLE) AS syy,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))
               * CAST(l_quantity AS DECIMAL(18,4)))
               AS VARCHAR) AS DOUBLE) AS sxy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n_rows,
           sx / CAST(n_rows AS DOUBLE) AS mean_price,
           sqrt((CAST(n_rows AS DOUBLE) * sxx - sx * sx) /
             (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0)))
             AS stddev_price,
           (CAST(n_rows AS DOUBLE) * sxy - sx * sy) /
             sqrt((CAST(n_rows AS DOUBLE) * sxx - sx * sx) *
               (CAST(n_rows AS DOUBLE) * syy - sy * sy)) AS corr_qty_price
         FROM a ORDER BY l_returnflag""",

    // width_bucket clamp semantics mirrored for scale safety: below-range
    // values land in bucket 0, at-or-above-range in bucket 21 (num+1) —
    // matching Spark's WidthBucket even though the test data stays in range.
    "q83_price_histogram" ->
      s"""WITH b AS (
           SELECT o_totalprice,
             CAST(CASE WHEN o_totalprice < 0.0 THEN 0
                       WHEN o_totalprice >= 500000.0 THEN 21
                       ELSE floor(o_totalprice / 25000.0) + 1 END AS BIGINT)
               AS bucket
           FROM orders)
         SELECT bucket, CAST((bucket - 1) * 25000 AS DOUBLE) AS bucket_lo,
           count(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sum_price
         FROM b GROUP BY 1 ORDER BY 1""",

    "q93_winsorize" ->
      """WITH cuts AS (
           SELECT lang, quantile_disc(n_chars, 0.05) AS p05,
             quantile_disc(n_chars, 0.95) AS p95
           FROM documents GROUP BY lang)
         SELECT d.lang, min(c.p05) AS p05, min(c.p95) AS p95,
           count(*) AS n_docs,
           CAST(sum(greatest(least(d.n_chars, c.p95), c.p05)) AS DOUBLE)
             / count(*) AS mean_wins
         FROM documents d JOIN cuts c ON d.lang = c.lang
         GROUP BY d.lang ORDER BY d.lang""",

    "q94_equidepth_histogram" ->
      s"""WITH cuts AS (
           SELECT ${(1 to 9).map(i =>
             s"quantile_disc(o_totalprice, 0.$i) AS b$i").mkString(", ")}
           FROM orders)
         SELECT CAST(1 ${(1 to 9).map(i =>
             s"+ CAST(o_totalprice > b$i AS INT)").mkString(" ")}
             AS BIGINT) AS bucket,
           count(*) AS n_orders, min(o_totalprice) AS lo,
           max(o_totalprice) AS hi
         FROM orders, cuts GROUP BY 1 ORDER BY 1""",

    "q95_skew_profile" ->
      """WITH k AS (
           SELECT l_orderkey, count(*) AS cnt FROM lineitem
           GROUP BY l_orderkey)
         SELECT CAST(length(bin(cnt)) AS BIGINT) AS bucket,
           count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total_rows,
           max(cnt) AS max_cnt
         FROM k GROUP BY 1 ORDER BY 1""")
}
