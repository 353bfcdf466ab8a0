package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scale posture demo: bucketing both sides of a fact-fact join on the
  * join key lets Spark plan a SortMergeJoin with NO Exchange — the
  * co-located join that makes repeated 100 TB joins affordable (shuffle
  * paid once at write time, not per query). */
class BucketedJoinSpec extends SparkSpecBase {

  test("bucketed fact-fact join plans without a shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_extendedprice"))
        .write.format("parquet").bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey").option("path", s"$wh/li")
        .mode("overwrite").saveAsTable("li_bucketed")
      Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.format("parquet").bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey").option("path", s"$wh/ord")
        .mode("overwrite").saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
