package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the adjacency artifact (operators/GraphArtifact +
  * streaming/StreamGraph): at an inflated edge set, measure (a) the
  * bulk build, (b) the LSM claim — append cost must be priced by the
  * DELTA, not the accumulated corpus (timed against the same delta on a
  * near-empty artifact), (c) a bucket-pruned neighbor probe vs the full
  * resolved read, and (d) a rebuild (compaction) under an in-flight
  * reader. Before any timing, the resolved read must equal the
  * reference edge set exactly.
  *
  * Usage: runMain graft.GraphArtifactProbe [sfDir] [mult] [nBuckets]
  */
object GraphArtifactProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(64)
    val nBuckets = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{GraphArtifact, GraphOps}

    val e1 = GraphOps.copurchaseEdges(
      graft.sources.Tables.lineitem(spark, sfDir)).cache()
    val off = 1000000000L
    val eM = (0 until mult).map { i =>
      e1.select((col("src") + lit(i * off)).as("src"),
        (col("dst") + lit(i * off)).as("dst"))
    }.reduce(_ union _).cache()
    println(s"edges=${e1.count()} -> ${eM.count()} " +
      s"(${mult}x disjoint copies) nBuckets=$nBuckets")

    def timed(tag: String)(body: => Long): Long = {
      val t0 = System.nanoTime()
      val n = body
      println(f"GRAPHART $tag%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
      n
    }

    val dir = s"/tmp/graft_graphart_probe_$mult"
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.delete(new org.apache.hadoop.fs.Path(dir), true)

    timed("bulk_build") {
      GraphArtifact.writeEdges(eM, dir, nBuckets); 0L }

    // correctness gate before timing: resolved read ≡ the canonical
    // undirected input
    val ref = eM.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val gap = GraphArtifact.readEdges(spark, dir)
      .join(ref, Seq("a", "b"), "full_outer")
      .filter(col("a").isNull || col("b").isNull).count()
    require(gap == 0L, s"resolved read diverged from reference: $gap rows")
    println("resolved read ≡ reference edge set")

    // (b) LSM pricing: the SAME small delta appended to the loaded
    // artifact vs to a near-empty one — the two walls must be of the
    // same order (append never scans the corpus)
    val delta = e1.limit(2000)
      .select((col("src") + lit(800 * off)).as("src"),
        (col("dst") + lit(800 * off)).as("dst")).cache()
    delta.count()
    timed("append_on_loaded") {
      GraphArtifact.appendEdges(delta, dir, "probe-append"); 0L }
    val dir0 = s"/tmp/graft_graphart_probe_empty_$mult"
    hfs.delete(new org.apache.hadoop.fs.Path(dir0), true)
    GraphArtifact.writeEdges(e1.limit(0), dir0, nBuckets)
    timed("append_on_empty") {
      GraphArtifact.appendEdges(delta, dir0, "probe-append"); 0L }

    // (c) pruned neighbor probe vs the full resolved read
    val someNode = e1.agg(min(col("src"))).head.getLong(0)
    for (_ <- 1 to 2) {
      timed("neighbor_probe") {
        GraphArtifact.neighborsStored(spark, dir, someNode)
          .collect().length.toLong }
      timed("full_read") {
        GraphArtifact.readEdges(spark, dir).count() }
    }
    println(f"probe reads 1 of $nBuckets bucket dirs " +
      f"(${100.0 / nBuckets}%.1f%%)")

    // (d) rebuild (compaction) under an in-flight reader: the old
    // reader resolved its generation pre-flip and drains intact
    val oldReader = GraphArtifact.readEdges(spark, dir)
    timed("rebuild_compact") {
      GraphArtifact.writeEdges(
        GraphArtifact.readEdges(spark, dir)
          .select(col("a").as("src"), col("b").as("dst")), dir, nBuckets)
      0L }
    timed("old_reader_drain") { oldReader.count() }
    timed("fresh_read") { GraphArtifact.readEdges(spark, dir).count() }
    timed("expire_gens") {
      GraphArtifact.expireEdgeGenerations(spark, dir).toLong }
    e1.unpersist(); eM.unpersist(); delta.unpersist()
    spark.stop()
  }
}
