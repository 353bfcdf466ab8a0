package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-level probe for the stored IVFADC path: separates
  * plan-construction cost (books load, freshness snapshot compare,
  * driver cell ranking) from execution cost against a written index.
  * Usage: runMain graft.ProbeAdc <indexPath> [sfDir]. Found the
  * listFiles(recursive) 150-s-per-probe listing regression. */
object ProbeAdc {
  def main(args: Array[String]): Unit = {
    val idx = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val e = graft.sources.Tables.embeddings(spark, sfDir)
    val queries = e.filter(col("vec_id") < 4L)
      .select(col("vec_id").as("qid"), col("embedding"))
    (0 until 2).foreach { i =>
      val plan = time(s"plan_$i") {
        graft.operators.VectorOps.probeIvfPqIndex(spark, idx, queries,
          k = 5, nprobe = 2, shortlist = 50)
      }
      time(s"count_$i")(plan.count())
    }
  }
}
