package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Exact._

/** Scratch experiment harness for optimization round 17 (not a declared
  * query; deleted or kept as a probe). Times labelled variants of hot
  * pipelines to isolate which stage dominates. */
object QuickExp {
  def time(label: String)(df: => DataFrame): Unit = {
    val ts = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"EXP $label%-34s min=${ts.min}%7.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "65536")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.names.foreach(t => Tables(spark, d, t).count())
    val s = spark

    // --- q140 decomposition ---
    def camp = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "3-MEDIUM" &&
        pmod(col("o_orderkey"), lit(5)) === lit(0))
      .select(col("o_orderkey").as("camp_id"),
        unix_timestamp(col("o_orderdate")).as("lo"),
        (unix_timestamp(col("o_orderdate")) + lit(4L * 86400L)).as("hi"))
    def pts = Tables.lineitem(s, d)
      .select(unix_timestamp(col("l_shipdate")).as("x"), col("l_quantity"))

    time("q140 scan only") {
      pts
    }
    time("q140 scan+spread") {
      Tables.spread(pts)
    }
    time("q140 full (as declared)") {
      pts.join(camp, col("x") >= col("lo") && col("x") < col("hi"))
        .groupBy(col("camp_id"))
        .agg(count(lit(1)).as("n_shipped"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("camp_id"))
    }
    time("q140 spread pts") {
      Tables.spread(pts).join(camp, col("x") >= col("lo") && col("x") < col("hi"))
        .groupBy(col("camp_id"))
        .agg(count(lit(1)).as("n_shipped"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("camp_id"))
    }
    time("q140 spread no-agg join only") {
      Tables.spread(pts).join(camp, col("x") >= col("lo") && col("x") < col("hi"))
    }

    def hashSpread(df: DataFrame): DataFrame = {
      val pnum = df.sparkSession.sparkContext.defaultParallelism
      df.repartition(pnum, pmod(xxhash64(df.columns.map(col): _*), lit(pnum)))
    }
    time("q140 hashSpread pts") {
      hashSpread(pts).join(camp, col("x") >= col("lo") && col("x") < col("hi"))
        .groupBy(col("camp_id"))
        .agg(count(lit(1)).as("n_shipped"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("camp_id"))
    }
    time("scan+hashSpread only") { hashSpread(pts) }

    // --- q125 job-fusion variant: lazy ckpt + dang agg materializes ---
    import graft.operators.Iterate
    def prFused(edges: DataFrame, iters: Int, scale: Long): DataFrame = {
      val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), lit(1L).as("w"))
      val linksrc = e
        .join(e.groupBy(col("src")).agg(sum(col("w")).as("tw")), "src")
        .repartition(col("src"))
        .persist()
      val flagged = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .join(e.select(col("src").as("node")).distinct()
          .withColumn("hasout", lit(true)), Seq("node"), "left")
        .select(col("node"), coalesce(col("hasout"), lit(false)).as("hasout"))
      val nodes = flagged.withColumn("seed", lit(true)).persist()
      val n = nodes.count()
      val seedBase = ((BigInt(15) * scale * n) / (BigInt(100) * n)).toLong
      var ranks = nodes.withColumn("rank", lit(scale)).localCheckpoint(false)
      for (_ <- 1 to iters) {
        // ONE job: materializes the lazy checkpoint AND returns the scalar
        val dang = ranks.filter(!col("hasout"))
          .agg(coalesce(sum(col("rank")), lit(0L))).head.getLong(0)
        val addD = dang / n
        val sums = ranks.join(linksrc, ranks("node") === linksrc("src"))
          .select(col("dst").as("node"),
            expr("(rank * w) div tw").as("contrib"))
          .groupBy(col("node")).agg(sum(col("contrib")).as("s"))
        val next = nodes.join(sums, Seq("node"), "left")
          .select(col("node"), col("hasout"), col("seed"),
            (lit(seedBase) +
              expr(s"(85L * (coalesce(s, 0L) + ${addD}L)) div 100L"))
              .as("rank"))
        ranks = next.localCheckpoint(false)
      }
      nodes.unpersist()
      linksrc.unpersist()
      ranks.select(col("node"), col("rank"))
    }
    val edgesMemo = graft.operators.GraphOps.copurchaseEdgesFor(s, d)
    time("q125 as declared") {
      graft.operators.GraphOps.pagerank(edgesMemo, iters = 5)
        .orderBy(col("rank").desc, col("node")).limit(100)
    }
    time("q125 fused lazy-ckpt") {
      prFused(edgesMemo, 5, 1000000L)
        .orderBy(col("rank").desc, col("node")).limit(100)
    }
    // row parity of the fused variant
    val aRows = graft.operators.GraphOps.pagerank(edgesMemo, iters = 5)
      .orderBy(col("rank").desc, col("node")).limit(100).collect()
    val bRows = prFused(edgesMemo, 5, 1000000L)
      .orderBy(col("rank").desc, col("node")).limit(100).collect()
    println("EXP q125 parity: " + (aRows.toSeq == bRows.toSeq))
    spark.stop()
  }
}
