package graft

import graft.sources.Tables

/** The engine is reachable through plain `spark.sql` too: temp views over
  * every table + the extension-registered native functions. */
class SqlSurfaceSpec extends SparkSpecBase {

  test("registerAll exposes all tables to SQL; star-join query runs") {
    Tables.registerAll(spark, sf)
    val r = spark.sql(
      """SELECT n_name, count(*) AS n
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n DESC LIMIT 5""").collect()
    assert(r.nonEmpty && r.forall(_.getLong(1) > 0))
  }

  test("approximate sketches: HLL distinct within 5% of exact (built-in, scale path)") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50"))
      .collect()(0)
    val exact = r.getLong(0); val approx = r.getLong(1)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"exact=$exact approx=$approx")
    assert(r.getDouble(2) > 0)
  }

  test("custom UDF tier is SQL-reachable: near-dup candidate SQL runs end-to-end") {
    Tables.registerAll(spark, sf)
    graft.functions.SqlFunctions.registerAll(spark)
    val r = spark.sql(
      """WITH sig AS (
           SELECT doc_id, minhash_sig8(text) AS sig FROM documents
           WHERE size(shingles3(text)) > 0),
         fp AS (SELECT doc_id, simhash_fp3(text) AS fp FROM documents)
         SELECT s.doc_id, size(s.sig) AS sig_len, f.fp
         FROM sig s JOIN fp f ON s.doc_id = f.doc_id
         ORDER BY s.doc_id LIMIT 20""").collect()
    assert(r.nonEmpty && r.forall(_.getInt(1) == 8))
  }

  test("SQL + native function + windowing compose") {
    Tables.registerAll(spark, sf)
    val r = spark.sql(
      """SELECT vec_id, cosine_fast(embedding, embedding) AS self_sim
         FROM embeddings LIMIT 10""").collect()
    assert(r.forall(row => math.abs(row.getDouble(1) - 1.0) < 1e-12))
  }

  test("graftevents is SQL-reachable via CREATE TEMPORARY VIEW ... USING") {
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW ev_sql
                 USING graftevents OPTIONS (events 500, chunk 100)""")
    val r = spark.sql(
      "SELECT count(*) AS n FROM ev_sql WHERE event_id >= 450").collect()
    assert(r(0).getLong(0) == 50)
    // the pushed range survives the SQL path: only the last chunk planned
    val planned = spark.sql("SELECT * FROM ev_sql WHERE event_id >= 450")
    assert(planned.rdd.getNumPartitions == 1,
      "event_id pushdown must prune partitions through SQL too")
  }

  test("zorder2 is SQL-reachable: ORDER BY a native Morton key") {
    Tables.registerAll(spark, sf)
    val r = spark.sql(
      """SELECT o_orderkey,
           zorder2(o_custkey & 1023L, o_orderkey & 1023L) AS z
         FROM orders ORDER BY z, o_orderkey LIMIT 20""").collect()
    assert(r.length == 20)
    // the SQL path produces the same interleave as the Column API
    val viaCol = Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.col("o_orderkey"),
        graft.functions.ZOrderExpr.zorder2(
          org.apache.spark.sql.functions.col("o_custkey")
            .bitwiseAND(org.apache.spark.sql.functions.lit(1023L)),
          org.apache.spark.sql.functions.col("o_orderkey")
            .bitwiseAND(org.apache.spark.sql.functions.lit(1023L))).as("z"))
      .orderBy("z", "o_orderkey").limit(20).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      viaCol.map(x => (x.getLong(0), x.getLong(1))).toSeq)
  }

  test("graft_knn TVF ≡ the library ivfKnnJoin, row for row") {
    import org.apache.spark.sql.functions.col
    Tables.registerAll(spark, sf)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
    val viaSql = spark.sql(
      """SELECT qid, vec_id, dot, rank
         FROM graft_knn('embeddings', 3, 2, 8)""")
    val p = viaSql.queryExecution.executedPlan.toString
    // the library path's scale signature: partial top-k before the qid
    // exchange, and never a nested loop
    assert(p.contains("WindowGroupLimit"),
      s"TVF lost the partial window-group-limit plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"TVF planned a nested loop:\n$p")
    val got = viaSql.collect().map(key).sorted.toSeq
    val lib = graft.operators.VectorOps
      .ivfKnnJoin(Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding")), k = 3, nprobe = 2,
        cells = 8)
      .collect().map(key).sorted.toSeq
    assert(got.nonEmpty && got == lib,
      "SQL TVF diverged from the DataFrame surface")
  }

  test("graft_knn_stored probes a written index from SQL, directory-pruned") {
    import org.apache.spark.sql.functions.col
    val path = java.nio.file.Files.createTempDirectory("ivf_sql").toString
    graft.operators.VectorOps.writeIvfIndex(
      Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding")),
      path, cells = 8)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
    // self-probe form ≡ the DataFrame surface
    val viaSql = spark.sql(
      s"SELECT * FROM graft_knn_stored('$path', 5, 5, 3)")
    val got = viaSql.collect().map(key).sorted.toSeq
    val lib = graft.operators.VectorOps
      .probeIvfIndex(spark, path, nQueries = 5, k = 5, nprobe = 3)
      .collect().map(key).sorted.toSeq
    assert(got.nonEmpty && got == lib,
      "stored-probe SQL diverged from the DataFrame surface")
    // the scan is partition-pruned: only probed cell dirs are read
    val p = viaSql.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cell"),
      s"stored probe from SQL lost directory pruning:\n$p")
    // external-queries form through a named relation
    Tables.embeddings(spark, sf).filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding"))
      .createOrReplaceTempView("knn_sql_queries")
    val ext = spark.sql(
      s"""SELECT * FROM graft_knn_stored('$path', 'knn_sql_queries',
            4, 2)""")
      .collect().map(key).sorted.toSeq
    val extLib = graft.operators.VectorOps
      .probeIvfIndex(spark, path,
        Tables.embeddings(spark, sf).filter(col("vec_id") < 3)
          .select(col("vec_id").as("qid"), col("embedding")),
        k = 4, nprobe = 2)
      .collect().map(key).sorted.toSeq
    assert(ext.nonEmpty && ext == extLib,
      "external-queries stored probe diverged from the DataFrame surface")
  }

  test("graft_knn_stored loud contracts: bad args and a missing index") {
    val e1 = intercept[Exception](
      spark.sql("SELECT * FROM graft_knn_stored('/tmp/x', 5)").collect())
    assert(messages(e1).exists(_.contains("exactly 4")), e1.toString)
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_knn_stored('/tmp/x', 5.5, 5, 3)").collect())
    assert(messages(e2).exists(_.contains("argument 2")), e2.toString)
    // a path with no written index names the build entry point
    val none = java.nio.file.Files
      .createTempDirectory("ivf_sql_none").toString
    val e3 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_knn_stored('$none', 5, 5, 3)").collect())
    assert(messages(e3).exists(_.contains("writeIvfIndex")), e3.toString)
  }

  test("graft_knn accepts case-differing column names (resolver semantics)") {
    import org.apache.spark.sql.functions.col
    Tables.embeddings(spark, sf)
      .select(col("vec_id").as("VEC_ID"), col("embedding").as("EMBEDDING"))
      .createOrReplaceTempView("knn_upper")
    val r = spark.sql(
      "SELECT * FROM graft_knn('knn_upper', 2, 2, 8)").limit(5).collect()
    assert(r.nonEmpty,
      "uppercase corpus columns falsely rejected under the default " +
        "case-insensitive resolver")
  }

  test("graft_knn loud argument contracts") {
    Tables.registerAll(spark, sf)
    // wrong arity
    val e1 = intercept[Exception](
      spark.sql("SELECT * FROM graft_knn('embeddings')").collect())
    assert(messages(e1).exists(_.contains("takes 2-4")), e1.toString)
    // non-literal argument
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM graft_knn('embeddings', 1 + 1)").collect())
    assert(messages(e2).exists(_.contains("integer literal")), e2.toString)
    // out-of-range k
    val e3 = intercept[Exception](
      spark.sql("SELECT * FROM graft_knn('embeddings', 0)").collect())
    assert(messages(e3).exists(_.contains("k must be >= 1")), e3.toString)
    // a relation without the corpus columns, named loudly
    val e4 = intercept[Exception](
      spark.sql("SELECT * FROM graft_knn('nation', 3)").collect())
    assert(messages(e4).exists(_.contains("vec_id, embedding")),
      e4.toString)
  }

  test("graft_hnsw_stored probes the written graph index from SQL") {
    import org.apache.spark.sql.functions.col
    val path = java.nio.file.Files.createTempDirectory("hnsw_sql").toString
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    graft.operators.Hnsw.writeIndex(emb, path, nShards = 4, m = 8,
      efConstruction = 32)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    // self-probe form ≡ the DataFrame surface (exhaustive mode, so the
    // parity is exact-by-theorem, not sampled)
    val viaSql = spark.sql(
      s"SELECT * FROM graft_hnsw_stored('$path', 5, 5, 2147483647)")
    val got = viaSql.collect().map(key).sorted.toSeq
    val lib = graft.operators.Hnsw
      .searchStored(spark, path, nQueries = 5, k = 5, ef = Int.MaxValue)
      .collect().map(key).sorted.toSeq
    assert(got.nonEmpty && got == lib,
      "stored-probe SQL diverged from the DataFrame surface")
    // external-queries form through a named relation (no self-
    // exclusion: the caller's qid space is unrelated to vec_ids)
    emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 1000L).as("qid"), col("embedding"))
      .createOrReplaceTempView("hnsw_sql_queries")
    val ext = spark.sql(
      s"""SELECT * FROM graft_hnsw_stored('$path', 'hnsw_sql_queries',
            4, 2147483647)""")
      .collect().map(key).sorted.toSeq
    val extLib = graft.operators.Hnsw.searchStored(spark, path,
      emb.filter(col("vec_id") < 3)
        .select((col("vec_id") + 1000L).as("qid"),
          col("embedding").as("qvec")),
      k = 4, ef = Int.MaxValue)
      .collect().map(key).sorted.toSeq
    assert(ext.nonEmpty && ext == extLib,
      "external-queries stored probe diverged from the DataFrame surface")
  }

  test("graft_hnsw_stored loud contracts: bad args, columns, missing index") {
    val e1 = intercept[Exception](
      spark.sql("SELECT * FROM graft_hnsw_stored('/tmp/x', 5)").collect())
    assert(messages(e1).exists(_.contains("exactly 4")), e1.toString)
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_hnsw_stored('/tmp/x', 5.5, 5, 64)").collect())
    assert(messages(e2).exists(_.contains("argument 2")), e2.toString)
    val e3 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_hnsw_stored('/tmp/x', 5, 5, 3)").collect())
    assert(messages(e3).exists(_.contains("must be >= k")), e3.toString)
    // a path with no written index names the build entry point
    val none = java.nio.file.Files
      .createTempDirectory("hnsw_sql_none").toString
    val e4 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_hnsw_stored('$none', 5, 5, 64)").collect())
    assert(messages(e4).exists(_.contains("writeIndex")), e4.toString)
    // a queries relation without (qid, embedding), named loudly
    Tables.registerAll(spark, sf)
    val path = java.nio.file.Files
      .createTempDirectory("hnsw_sql_cols").toString
    import org.apache.spark.sql.functions.col
    graft.operators.Hnsw.writeIndex(
      Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding")).limit(50),
      path, nShards = 2, m = 4, efConstruction = 8)
    val e5 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_hnsw_stored('$path', 'nation', 3, 64)")
      .collect())
    assert(messages(e5).exists(_.contains("qid, embedding")), e5.toString)
  }
}
