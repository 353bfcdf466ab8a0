package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-level probe for the LSH-family queries (q35/q37/q48):
  * times each stage separately and prints band-bucket size stats to locate
  * the quadratic candidate-pair blowup.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{TextFns => T}
    import graft.sources.Tables

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }

    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    time("docs.count")(base.count())

    // --- q48 stages ---
    val planted = base.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val hashed = base.union(planted)
      .select(col("doc_id"), T.shinglesUdf(3)(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), transform(col("sh"), w => xxhash64(w)).as("hs"))
      .persist()
    time("q48.hash")(hashed.count())
    val fp = hashed
      .select(col("doc_id"), T.simhash64FromHashes(col("hs")).as("fp"))
      .persist()
    time("q48.simhash")(fp.count())
    time("q48.distinct_fp")(println("  distinct fps = " + fp.select("fp").distinct().count()))
    val bands = fp.select(col("doc_id"), col("fp"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bkey", expr("(fp >> (band * 16)) & 65535"))
    time("q48.bucket_stats") {
      bands.groupBy("band", "bkey").count()
        .agg(count(lit(1)).as("n_buckets"), max("count").as("max_bucket"),
          sum(col("count") * col("count")).as("sum_sq"))
        .show(false)
    }
    val a = bands.alias("a"); val b = bands.alias("b")
    val pairs = a.join(b, col("a.band") === col("b.band") &&
        col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") < col("b.doc_id"))
      .filter(T.hamming64(col("a.fp"), col("b.fp")) <= 3)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    time("q48.join+filter")(println("  pre-distinct pairs = " + pairs.count()))
    time("q48.full")(pairs.distinct().count())
    hashed.unpersist(); fp.unpersist()

    // --- q35/q37 bucket stats ---
    val sig = Tables.documents(spark, sfDir)
      .withColumn("shingles", T.shinglesUdf(3)(col("text")))
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"), col("shingles"),
        T.minhashKmUdf(8)(col("shingles")).as("sig"))
      .persist()
    time("q35.sig")(sig.count())
    val b35 = sig.select(col("doc_id"),
        explode(T.bandKeys(col("sig"), 4, 2)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      .persist()
    time("q35.bands")(b35.count())
    time("q35.bucket_stats") {
      b35.groupBy("band", "bkey").count()
        .agg(count(lit(1)).as("n_buckets"), max("count").as("max_bucket"),
          sum(col("count") * col("count")).as("sum_sq"))
        .show(false)
    }
    val pa = b35.alias("a"); val pb = b35.alias("b")
    time("q35.join")(println("  pre-distinct pairs = " +
      pa.join(pb, col("a.band") === col("b.band") &&
          col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id")).count()))
    spark.stop()
  }
}
