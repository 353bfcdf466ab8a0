package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: time named SparkEntry queries (or all, with "all")
  * against a scale dir. Usage:
  *   runMain graft.ProfileQ <sfDir> q48_simhash_neardup q37_jaccard_verify
  * Add "explain" as a query name suffix-arg to print formatted plans.
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("explain")
    val names = args.drop(1).filterNot(_ == "explain") match {
      case Array("all") | Array() => SparkEntry.queries.keys.toSeq.sorted
      case qs => qs.toSeq
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.sources.Tables.names.foreach(t => graft.sources.Tables(spark, sfDir, t).count())
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"PROFILE $name%-28s min=${times.min}%8.3f s  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
