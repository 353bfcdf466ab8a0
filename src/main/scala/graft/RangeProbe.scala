package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B timer for the non-equi interval join at an inflated corpus: the
  * naive band-predicate join (what Spark plans without help — a
  * BroadcastNestedLoopJoin evaluating every point×interval pair) vs the
  * bin-bucketed equijoin rewrite (operators/IntervalJoin.pointInInterval).
  *
  * Both sides inflate ×mult with a disjoint time shift per copy, so match
  * density per bin is constant: the naive form's work grows as mult²
  * (it compares every pair regardless of time locality) while the binned
  * form grows as mult (shuffle + same-bin candidates only). The forms
  * must agree row-for-row before any timing counts.
  *
  * Usage: runMain graft.RangeProbe [sfDir] [mult]
  */
object RangeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.Tables

    // one copy spans ~1992-1998; shift copies 4000 days apart so matches
    // never cross copies and per-bin density is copy-identical
    val shiftS = 4000L * 86400L
    def inflate(df: DataFrame, m: Int, idCol: String, tsCols: Seq[String]): DataFrame =
      (0 until m).map { i =>
        val idShifted = df.withColumn(idCol, col(idCol) + lit(i * 1000000000L))
        tsCols.foldLeft(idShifted)((d, c) =>
          d.withColumn(c, col(c) + lit(i * shiftS)))
      }.reduce(_ union _)

    def points(m: Int): DataFrame = inflate(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("p_id"),
          unix_timestamp(col("l_shipdate")).as("x"), col("l_quantity")),
      m, "p_id", Seq("x")).cache()

    def intervals(m: Int): DataFrame = inflate(
      Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("camp_id"),
          unix_timestamp(col("o_orderdate")).as("lo"),
          (unix_timestamp(col("o_orderdate")) + lit(5L * 86400L)).as("hi")),
      m, "camp_id", Seq("lo", "hi")).cache()

    def agg(joined: DataFrame): DataFrame =
      joined.groupBy(col("camp_id"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))

    def naive(p: DataFrame, iv: DataFrame): DataFrame =
      agg(p.join(iv, col("x") >= col("lo") && col("x") < col("hi")))

    def binned(p: DataFrame, iv: DataFrame): DataFrame =
      agg(graft.operators.IntervalJoin.pointInInterval(
        p, "x", iv, "lo", "hi", binWidth = 86400L))

    def run(tag: String, df: => DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = df.collect().length
      println(f"RANGE $tag%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s groups=$n")
      n
    }

    // correctness first, at 1×: row-identical aggregates
    val p1 = points(1); val iv1 = intervals(1)
    println(s"points=${p1.count()} intervals=${iv1.count()} (1x)")
    val a = naive(p1, iv1).collect().map(_.toSeq).toSet
    val b = binned(p1, iv1).collect().map(_.toSeq).toSet
    require(a == b, s"forms diverged: extra=${(a -- b).take(2)} " +
      s"missing=${(b -- a).take(2)}")
    println(s"forms agree on ${a.size} campaign groups")

    for (m <- Seq(1, mult)) {
      val p = points(m); val iv = intervals(m)
      p.count(); iv.count() // materialize caches outside the timers
      run(s"naive_${m}x", naive(p, iv))
      run(s"binned_${m}x", binned(p, iv))
      run(s"naive2_${m}x", naive(p, iv))
      run(s"binned2_${m}x", binned(p, iv))
      if (m != 1) { p.unpersist(); iv.unpersist() }
    }
    spark.stop()
  }
}
