package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B timer for the deterministic shuffle-shard rank at a synthetic
  * N-row id corpus: the naive single-partition global window (what the
  * one-liner `row_number() OVER (ORDER BY md5(id))` plans — every row
  * through one task) vs the distributed two-pass rank
  * (operators/ExportOps.shuffleShards). The forms must agree row-for-row
  * at a small N before any timing counts; at the probe N only aggregate
  * invariants are checked (pos sum / max), since collecting N rows to
  * compare would itself be the bottleneck.
  *
  * Usage: runMain graft.ExportProbe [nRows] [nBuckets]
  */
object ExportProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nb = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def ids(m: Long): DataFrame =
      spark.range(m).select(col("id")).cache()

    def naive(df: DataFrame, shardSize: Long): DataFrame = {
      val w = Window.orderBy(col("_k"), col("id"))
      df.withColumn("_k", md5(col("id").cast("string")))
        .withColumn("pos", row_number().over(w).cast("long") - lit(1L))
        .select(col("id"), col("pos"),
          expr(s"pos div ${shardSize}L").as("shard"))
    }

    def invariants(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("pos")), max(col("pos"))).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    def run(tag: String, df: => DataFrame): (Long, Long, Long) = {
      val t0 = System.nanoTime()
      val inv = invariants(df)
      println(f"EXPORT $tag%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s " +
        f"n=${inv._1} possum=${inv._2} posmax=${inv._3}")
      inv
    }

    // correctness first, small N: row-identical
    val small = ids(100000L); small.count()
    val a = naive(small, 1000L).collect().map(_.toSeq).toSet
    val b = graft.operators.ExportOps
      .shuffleShards(small, "id", 1000L, nBuckets = nb)
      .collect().map(_.toSeq).toSet
    require(a == b, s"forms diverged at small N: extra=${(a -- b).take(2)} " +
      s"missing=${(b -- a).take(2)}")
    println(s"forms agree on ${a.size} rows (small N)")
    small.unpersist()

    val big = ids(n); big.count()
    val shard = math.max(1L, n / 1024L)
    val inv1 = run("naive_window", naive(big, shard))
    val inv2 = run("distributed", graft.operators.ExportOps
      .shuffleShards(big, "id", shard, nBuckets = nb))
    val inv3 = run("naive_window2", naive(big, shard))
    val inv4 = run("distributed2", graft.operators.ExportOps
      .shuffleShards(big, "id", shard, nBuckets = nb))
    require(inv1 == inv2 && inv2 == inv3 && inv3 == inv4,
      "invariants diverged between the forms")
    spark.stop()
  }
}
