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

  test("SQL + native function + windowing compose") {
    Tables.registerAll(spark, sf)
    val r = spark.sql(
      """SELECT vec_id, cosine_fast(embedding, embedding) AS self_sim
         FROM embeddings LIMIT 10""").collect()
    assert(r.forall(row => math.abs(row.getDouble(1) - 1.0) < 1e-12))
  }
}
