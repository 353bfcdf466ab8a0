package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B timer for the k-NN join at an inflated corpus: one warm pass
  * (codegen + file listing), then a measured pass per top-k form —
  * the row_number window (default; Catalyst's WindowGroupLimit bounds
  * the exchange) vs the hand-built TopKPerKey plan
  * (-Dgraft.knn.topk=native). Decided the primitive-array UDF
  * signatures, rejected the typed top-k Aggregator (185-189 s), and
  * rejected native-by-default (window 21-26 s vs native 27-28 s,
  * identical 384k-record exchanges — rationale at knnJoinAssigned).
  * Usage: runMain graft.KnnProbe [sfDir] [mult]. */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Tables
    import graft.operators.VectorOps
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val bigE = (0 until mult).map(k =>
      e.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        col("embedding"))).reduce(_ union _)
    def run(tag: String): Unit = {
      val t0 = System.nanoTime()
      val n = VectorOps.ivfKnnJoin(bigE, k = 3, nprobe = 1, cells = 0).count()
      println(f"KNN $tag%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
      spark.catalog.clearCache()
    }
    run("warm")
    run("window")
    run("window2")
    sys.props("graft.knn.topk") = "native"
    run("native")
    run("native2")
    sys.props.remove("graft.knn.topk")
  }
}
