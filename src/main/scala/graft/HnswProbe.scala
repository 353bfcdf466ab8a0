package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.operators.Hnsw

/** Scale probe for the sharded HNSW index (round 14): on a mult×
  * corpus of deterministically-perturbed embedding copies,
  *
  *  1. price the BUILD (one graph per shard, shards in parallel);
  *  2. price a 20-query SEARCH at a realistic beam against the exact
  *     brute-force flat scan over the same corpus (the baseline any
  *     ANN structure must beat), and measure recall@10 against that
  *     brute truth;
  *  3. price the exhaustive mode (`ef = ∞`) — the correctness gate's
  *     degenerate path, whose result must EQUAL brute force exactly
  *     (distributed compare, the RankProbe gate discipline).
  *
  * Usage: runMain graft.HnswProbe [sfDir] [mult]
  */
object HnswProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"HNSW $tag%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // mult× corpus: copy c of vec v gets a deterministic per-(copy,dim)
    // perturbation (the splitmix discipline — no RNG, bit-reproducible)
    // so copies are NEAR the original but distinct: realistic ANN
    // geometry instead of exact-duplicate ties
    val e1 = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val off = 1000000L
    val corpus = (0 until mult).map { c =>
      e1.select((col("vec_id") + lit(c * off)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + (pmod(xxhash64(lit(c), i, col("vec_id")), lit(2001L))
            .cast("float") - 1000.0f) / 10000.0f).cast("float"))
          .as("embedding"))
    }.reduce(_ union _).cache()
    val n = corpus.count()
    println(s"corpus=$n vectors (${mult}x), dim=64")

    val dir = s"/tmp/graft_hnswprobe_$mult"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val nShards = 32
    timed("build")(Hnsw.writeIndex(corpus, dir, nShards = nShards,
      m = 8, efConstruction = 32))

    val qids = (0L until 20L).toSeq
    val queries = corpus.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .cache()
    queries.count()

    val k = 10
    // brute truth: exact decimal top-k over the whole corpus — the
    // flat-scan baseline (what a 100 TB query pays WITHOUT the index)
    def brute(): DataFrame = {
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("dot").desc, col("vec_id"))
      corpus.crossJoin(broadcast(
          queries.select(col("qid"), col("qvec").as("qv"))))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("dot", VectorFns.dotExact(col("qv"), col("embedding")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("qid"), col("vec_id"), col("rank"))
    }
    val truth = timed("brute_flat_scan")(brute().localCheckpoint(true))

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("qid"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val approx = timed("search_ef64")(
      Hnsw.searchStored(spark, dir, queries, k = k, ef = 64,
        excludeSelf = true).localCheckpoint(true))
    val truthPairs = pairs(truth)
    val recall = (truthPairs & pairs(approx)).size.toDouble / truthPairs.size
    println(f"recall@$k (ef=64) = $recall%.3f over ${qids.length} queries")

    // the exactness gate at probe scale: exhaustive mode ≡ brute force
    val exact = timed("search_exhaustive")(
      Hnsw.searchStored(spark, dir, queries, k = k, ef = Int.MaxValue,
        excludeSelf = true).localCheckpoint(true))
    val mism = truth.select(col("qid"), col("vec_id"), col("rank"))
      .exceptAll(exact.select(col("qid"), col("vec_id"), col("rank")))
      .count()
    require(mism == 0L,
      s"exhaustive mode diverged from brute force on $mism rows")
    println(s"exhaustive ≡ brute force on ${truthPairs.size} truth rows")

    // single-scan pin: the walk emits candidate vectors inline, so a
    // stored probe reads the index parquet exactly once (the round-14
    // verdict's IO note — rerank must not re-scan the store); derived
    // from a fresh plan (localCheckpoint replaced the timed one's)
    // pin on the QUALIFIED nodes-store path of the served generation —
    // a substring contains(dir) could miscount if another scanned path
    // embedded dir as a prefix
    val nodesPath = new org.apache.hadoop.fs.Path(
      Hnsw.indexGenDir(spark, dir) + "/nodes").toUri.getPath
    val scanPin = Hnsw.searchStored(spark, dir, queries, k = k, ef = 64,
        excludeSelf = true)
      .queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation
            if r.relation.isInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation] &&
            r.relation.asInstanceOf[
                org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.rootPaths.exists(_.toUri.getPath == nodesPath) => r
      }.size
    require(scanPin == 1, s"expected 1 index scan, found $scanPin")
    println(s"index scans per query batch = $scanPin (single-scan pin)")

    // APPEND leg: grow the corpus by one more perturbed copy — every
    // new id exceeds every stored one, so the append rebuilds only the
    // shards the batch hashes into and the grown index must stay
    // EXACTLY right (exhaustive ≡ brute over the grown corpus)
    val delta = e1.select((col("vec_id") + lit(mult.toLong * off))
        .as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x + (pmod(xxhash64(lit(mult), i, col("vec_id")), lit(2001L))
          .cast("float") - 1000.0f) / 10000.0f).cast("float"))
        .as("embedding"))
    timed("append_1_copy")(Hnsw.appendToHnswIndex(spark, dir, delta))
    val corpus2 = corpus.union(delta).cache()
    println(s"corpus after append = ${corpus2.count()} vectors")
    def brute2(): DataFrame = {
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("dot").desc, col("vec_id"))
      corpus2.crossJoin(broadcast(
          queries.select(col("qid"), col("qvec").as("qv"))))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("dot", VectorFns.dotExact(col("qv"), col("embedding")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("qid"), col("vec_id"), col("rank"))
    }
    val truth2 = timed("brute_post_append")(brute2().localCheckpoint(true))
    val exact2 = timed("search_post_append")(
      Hnsw.searchStored(spark, dir, queries, k = k, ef = Int.MaxValue,
        excludeSelf = true).localCheckpoint(true))
    val mism2 = truth2
      .exceptAll(exact2.select(col("qid"), col("vec_id"), col("rank")))
      .count()
    require(mism2 == 0L,
      s"post-append exhaustive diverged from brute on $mism2 rows")
    println("post-append exhaustive ≡ brute force")

    // SHARD-LOCALIZED append (round 16): a 2k batch whose ids ALL hash
    // to one shard — with the hard-link carry-forward the cost is
    // O(batch + that shard's rebuild) plus link METADATA for the other
    // 31 shards, never O(index bytes) (the full-copy append above
    // touches every shard, so it prices the worst case; this leg
    // prices the streaming-maintenance case StreamHnsw rides)
    val base2 = (mult.toLong + 1L) * off
    val localBatch = spark.range(base2, base2 + 400000L)
      .select(col("id").as("vec_id"))
      .filter(pmod(xxhash64(col("vec_id")), lit(nShards.toLong)) === lit(7L))
      .limit(2000)
      .select(col("vec_id"),
        transform(sequence(lit(1), lit(64)), i =>
          ((pmod(xxhash64(col("vec_id"), i), lit(2001L)).cast("float")
            - 1000.0f) / 1000.0f).cast("float")).as("embedding"))
      .localCheckpoint(true)
    timed("append_1shard_2k")(
      Hnsw.appendToHnswIndex(spark, dir, localBatch))
    // freshness over the grown corpus proves the batch landed; the
    // untouched 31 shards carried over as links (zero data bytes)
    Hnsw.requireFresh(spark, dir,
      corpus2.select(col("vec_id")).union(localBatch.select(col("vec_id"))))
    println("shard-localized append landed; staleness guard green")
    spark.stop()
  }
}
