package graft

import org.apache.spark.sql.DataFrame

/** Sketch/approximate tier (SketchOps): semantic properties the oracle
  * can't see — sketch tolerance flags actually bind, the bloom prune
  * really filters the fact scan before the join, grouping sets produce
  * exactly the declared set shapes. */
class SketchOpsSpec extends SparkSpecBase {

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  test("q60: grouping sets emit (flag,status) + (flag) + grand total rows") {
    val rows = q("q60_grouping_sets").collect()
    val fine = rows.count(r => !r.isNullAt(0) && !r.isNullAt(1))
    val mid = rows.count(r => !r.isNullAt(0) && r.isNullAt(1))
    val total = rows.count(r => r.isNullAt(0) && r.isNullAt(1))
    assert(total == 1, "exactly one grand-total row")
    assert(mid > 0 && fine >= mid, s"set shapes off: fine=$fine mid=$mid")
    // grand total equals the sum of the finest level
    val li = graft.sources.Tables.lineitem(spark, sf).count()
    val grand = rows.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(grand.getLong(grand.fieldIndex("n_rows")) == li)
  }

  test("q61: HLL estimate is within the declared 5% of exact everywhere") {
    val rows = q("q61_hll_distinct").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)), "hll_ok must hold on every region")
  }

  test("q62: quantile sketch within 1% of exact; exact percentiles ordered") {
    val rows = q("q62_quantile_sketch").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4), s"sketch out of tolerance: $r")
      assert(r.getDouble(1) <= r.getDouble(2), "p50 <= p99")
    }
  }

  test("Exact.percentileDisc is bit-identical to the built-in percentile_disc") {
    import org.apache.spark.sql.functions._
    import graft.functions.Exact
    val li = graft.sources.Tables.lineitem(spark, sf)
    val builtin = li.groupBy(col("l_returnflag")).agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice)").as("p99"))
      .orderBy(col("l_returnflag")).collect()
    val dist = Exact.percentileDisc(li, col("l_returnflag"),
        col("l_extendedprice"), Map("p50" -> 0.5, "p99" -> 0.99))
      .orderBy(col("l_returnflag")).collect()
    assert(builtin.length == dist.length && builtin.nonEmpty)
    builtin.zip(dist).foreach { case (b, m) =>
      assert(b.getString(0) == m.getString(0))
      assert(b.getDouble(b.fieldIndex("p50")) == m.getDouble(m.fieldIndex("p50")),
        s"p50 diverges for ${b.getString(0)}")
      assert(b.getDouble(b.fieldIndex("p99")) == m.getDouble(m.fieldIndex("p99")),
        s"p99 diverges for ${b.getString(0)}")
    }
  }

  test("q63: bloom prune sits below the join and actually drops rows") {
    val df = q("q63_bloom_join")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("UDF"), s"expected bloom mightContain filter:\n$plan")
    // the pruned fact side must be smaller than the full fact table but
    // still a superset of true matches (no false negatives) — the final
    // aggregate equals the plain join's, which the oracle pins; here we
    // check the prune is real on this data
    val urgent = graft.sources.Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
    val bloom = urgent.stat.bloomFilter("o_orderkey", 100000L, 0.01)
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey").collect().map(_.getLong(0))
    val kept = li.count(bloom.mightContainLong)
    assert(kept < li.length, "bloom must prune some rows at this selectivity")
  }

  test("q64: redaction masks every planted email and phone") {
    import org.apache.spark.sql.functions._
    val rows = q("q64_pii_redact").collect()
    assert(rows.forall(_.getLong(1) >= 1), "every doc has a planted email")
    assert(rows.forall(_.getLong(2) >= 1), "every doc has a planted phone")
    // spot-check content: rebuild one redacted doc and confirm no raw PII
    val doc = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") === 0)
      .select(concat(col("text"), lit(" contact user0@mail.example ph 555-0000")))
      .collect()(0).getString(0)
    val red = doc
      .replaceAll("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
      .replaceAll("\\d{3}-\\d{4}", "<PHONE>")
    assert(!red.contains("@") && red.contains("<EMAIL>") && red.contains("<PHONE>"))
  }
}
