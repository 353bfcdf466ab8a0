package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the graph family (operators/GraphOps): inflate the
  * co-purchase graph `mult`× as DISJOINT id-offset copies — which leaves
  * every per-copy answer bit-identical to the 1× run (teleport and
  * dangling shares are per-node constants, components don't interact) —
  * then (a) gate the distributed results at scale against the 1× answers
  * exactly, and (b) measure the degree-orientation wedge bound that makes
  * triangle counting skew-safe.
  *
  * The q132-q135 leg rides the same invariance: k-core peels, BFS
  * layers, and label votes never cross components, and HITS's rescale
  * divisor is a GLOBAL max that equals every copy's local max because
  * the copies are identical — so each copy-0 answer must be
  * bit-identical at any mult.
  *
  * Usage: runMain graft.GraphProbe [sfDir] [mult] [triangles:on|off]
  *          [algos:on|off]
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(8)
    val doTri = args.lift(2).forall(_ != "off")
    val doAlgos = args.lift(3).forall(_ != "off")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.GraphOps

    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"GRAPH $tag%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val e1 = GraphOps.copurchaseEdges(
      graft.sources.Tables.lineitem(spark, sfDir)).cache()
    val off = 1000000000L
    val eM = (0 until mult).map { i =>
      e1.select((col("src") + lit(i * off)).as("src"),
        (col("dst") + lit(i * off)).as("dst"))
    }.reduce(_ union _).cache()
    println(s"edges=${e1.count()} -> ${eM.count()} (${mult}x disjoint copies)")

    def asMap(df: DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bounded collects: ranks/counts of the 1x component (~|parts| rows)
    // — the probe's gate, not an operator pattern

    val pr1 = timed("pagerank_1x")(asMap(GraphOps.pagerank(e1, 5)))
    val prM = timed(s"pagerank_${mult}x")(
      asMap(GraphOps.pagerank(eM, 5).filter(col("node") < off)))
    require(pr1 == prM,
      s"pagerank at ${mult}x diverged from 1x on the copy-0 component")
    println(s"pagerank copy-0 ranks identical at ${mult}x (${pr1.size} nodes)")

    if (doTri) {
      val t1 = timed("triangles_1x")(asMap(GraphOps.triangleCounts(e1)))
      val tM = timed(s"triangles_${mult}x")(
        asMap(GraphOps.triangleCounts(eM).filter(col("node") < off)))
      require(t1 == tM,
        s"triangles at ${mult}x diverged from 1x on the copy-0 component")
      println(s"triangle counts identical at ${mult}x (${t1.size} nodes)")
      // the wedge bound, measured on the inflated graph: naive =
      // sum C(deg,2) (what a middle-node join enumerates), oriented =
      // sum C(outdeg,2) (what degree orientation enumerates)
      val und = eM.select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
      val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
      val withDeg = und
        .join(deg.select(col("node").as("a"), col("d").as("da")), "a")
        .join(deg.select(col("node").as("b"), col("d").as("db")), "b")
      val ori = withDeg.select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("a")).otherwise(col("b")).as("s"))
      val naive = deg.agg(sum(expr("d * (d - 1) div 2"))).head.getLong(0)
      val odeg = ori.groupBy(col("s")).agg(count(lit(1)).as("od"))
      val oriented = odeg.agg(sum(expr("od * (od - 1) div 2"))).head.getLong(0)
      val maxD = deg.agg(max(col("d"))).head.getLong(0)
      val maxOd = odeg.agg(max(col("od"))).head.getLong(0)
      println(f"wedges naive=$naive oriented=$oriented " +
        f"(${naive.toDouble / oriented}%.1fx fewer) " +
        f"maxdeg=$maxD -> maxoutdeg=$maxOd")
    }
    if (doAlgos) {
      import graft.operators.GraphAlgos
      val part = graft.sources.Tables.part(spark, sfDir)

      val kc1 = timed("kcore_1x")(asMap(GraphAlgos.kCore(e1, 30)))
      val kcM = timed(s"kcore_${mult}x")(
        asMap(GraphAlgos.kCore(eM, 30).filter(col("node") < off)))
      require(kc1 == kcM,
        s"kcore at ${mult}x diverged from 1x on the copy-0 component")
      println(s"kcore survivors identical at ${mult}x (${kc1.size} nodes)")

      def asPair(df: DataFrame): Map[Long, (Long, Long)] =
        df.collect().map(r =>
          r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val h1 = timed("hits_1x")(asPair(GraphAlgos.hits(e1, 5)))
      val hM = timed(s"hits_${mult}x")(
        asPair(GraphAlgos.hits(eM, 5).filter(col("node") < off)))
      require(h1 == hM,
        s"hits at ${mult}x diverged from 1x on the copy-0 component")
      println(s"hits auth/hub identical at ${mult}x (${h1.size} nodes)")

      val seeds1 = part.filter(col("p_size") >= 40)
        .select(col("p_partkey").as("node"), col("p_brand").as("label"))
        .cache()
      val seedsM = (0 until mult).map { i =>
        seeds1.select((col("node") + lit(i * off)).as("node"), col("label"))
      }.reduce(_ union _)
      def asLabel(df: DataFrame): Map[Long, String] =
        df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val s1 = timed("spread_1x")(
        asLabel(GraphAlgos.labelSpread(e1, seeds1, 4)))
      val sM = timed(s"spread_${mult}x")(
        asLabel(GraphAlgos.labelSpread(eM, seedsM, 4)
          .filter(col("node") < off)))
      require(s1 == sM,
        s"labelSpread at ${mult}x diverged from 1x on the copy-0 component")
      println(s"spread labels identical at ${mult}x (${s1.size} nodes)")

      val sup1 = GraphAlgos.copurchaseSupported(
        graft.sources.Tables.lineitem(spark, sfDir), 2).cache()
      val supM = (0 until mult).map { i =>
        sup1.select((col("src") + lit(i * off)).as("src"),
          (col("dst") + lit(i * off)).as("dst"))
      }.reduce(_ union _)
      val bseeds1 = part.filter(col("p_brand") === "Brand#1")
        .select(col("p_partkey").as("node"))
      val bseedsM = (0 until mult).map { i =>
        bseeds1.select((col("node") + lit(i * off)).as("node"))
      }.reduce(_ union _)
      val b1 = timed("bfs_1x")(
        asMap(GraphAlgos.bfsLayers(sup1, bseeds1, 4)))
      val bM = timed(s"bfs_${mult}x")(
        asMap(GraphAlgos.bfsLayers(supM, bseedsM, 4)
          .filter(col("node") < off)))
      require(b1 == bM,
        s"bfsLayers at ${mult}x diverged from 1x on the copy-0 component")
      println(s"bfs layers identical at ${mult}x (${b1.size} nodes)")

      def asEdge(df: DataFrame): Map[(Long, Long), Long] =
        df.collect().map(r =>
          (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val em1 = timed("embed_1x")(asEdge(GraphAlgos.edgeEmbeddedness(e1)))
      val emM = timed(s"embed_${mult}x")(
        asEdge(GraphAlgos.edgeEmbeddedness(eM).filter(col("a") < off)))
      require(em1 == emM,
        s"embeddedness at ${mult}x diverged from 1x on copy-0")
      println(s"embeddedness identical at ${mult}x (${em1.size} edges)")

      // walks: copy-0 invariance holds because the md5 pick depends
      // only on (node id, step, walk id) — all unchanged on copy 0
      def asWalk(df: DataFrame): Set[(Long, Long, Long, Long)] =
        df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val w1 = timed("walks_1x")(
        asWalk(GraphAlgos.randomWalks(e1, bseeds1, 2, 4)))
      val wM = timed(s"walks_${mult}x")(
        asWalk(GraphAlgos.randomWalks(eM, bseedsM, 2, 4)
          .filter(col("seed") < off)))
      require(w1 == wM,
        s"randomWalks at ${mult}x diverged from 1x on copy-0")
      println(s"walks identical at ${mult}x (${w1.size} rows)")
      seeds1.unpersist(); sup1.unpersist()
    }
    e1.unpersist(); eM.unpersist()
    spark.stop()
  }
}
