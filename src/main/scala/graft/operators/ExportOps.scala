package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic global shuffle + exact-size shard assignment — the
  * training-data export "last mile" (SURVEY.md §2.11 extension).
  *
  * A training run wants its corpus in a pseudo-random but REPRODUCIBLE
  * order, cut into exact-size shards. The naive Spark form is
  * `row_number() OVER (ORDER BY md5(id))` — a single-partition window
  * that funnels the entire corpus through one task, the one window shape
  * that cannot scale (the same hazard q54's packing avoids).
  *
  * This operator computes the identical exact global rank distributedly:
  *
  *  1. shuffle key `k = md5(id)` — a deterministic uniform permutation;
  *  2. range-bucket WITHOUT sampling: md5 is uniform on the hex keyspace,
  *     so `bucket = prefix32(k) * nBuckets / 2^32` is a balanced range
  *     partition by construction — unlike `repartitionByRange`, whose
  *     sampled bounds can differ between the two passes (each Spark
  *     action re-plans the exchange), it is bit-stable across jobs;
  *     fixed-width lowercase-hex compare ≡ numeric compare, so bucket
  *     order extends the global `k` order;
  *  3. per-bucket counts → driver prefix sum (bounded: ≤ nBuckets rows,
  *     never data) → broadcast offsets;
  *  4. `row_number()` per bucket (parallel windows, each ≈ N/nBuckets
  *     rows) + the bucket's offset = the exact global position;
  *  5. `shard = pos div shardSize` — every shard exactly full except the
  *     last. A writer then partitions by `shard` with
  *     `sortWithinPartitions(pos)` to lay files out in shuffle order.
  *
  * Cost: two passes over an (id)-projection (counts, rank) and one hash
  * exchange on the bucket — no global sort, no sampling, no driver data.
  * Ties cannot occur (md5 collisions aside, `id` breaks them), so the
  * rank is total and the output is a permutation of 0..N-1 — the oracle
  * replays the naive global window and must match row-for-row.
  */
object ExportOps {

  /** (idCol, pos, shard): `pos` = exact rank of md5(id) over the whole
    * input (a deterministic global shuffle), `shard` = pos div shardSize.
    * `nBuckets` bounds per-window memory at ≈ N/nBuckets rows; it only
    * changes parallelism, never the output. `idCol` is assumed unique
    * (a primary key): duplicate ids still yield a valid permutation,
    * but WHICH duplicate gets which of their adjacent positions is
    * tie-arbitrary — don't feed a non-key column and expect replay
    * determinism row-for-row. */
  def shuffleShards(df: DataFrame, idCol: String, shardSize: Long,
      nBuckets: Int = 0): DataFrame = {
    require(shardSize > 0, s"ExportOps: shardSize must be > 0, got $shardSize")
    require(df.columns.contains(idCol),
      s"ExportOps: id column `$idCol` not found in " +
        df.columns.mkString("[", ", ", "]"))
    require(!Set("_k", "_b", "_off", "pos", "shard").contains(idCol),
      s"ExportOps: id column `$idCol` collides with a work/output column " +
        "name — rename it first")
    val spark = df.sparkSession
    val nb =
      if (nBuckets > 0) nBuckets
      else spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    require(nb > 0 && nb <= (1 << 24), s"ExportOps: bad nBuckets $nb")
    val keyed = df
      .select(col(idCol), md5(col(idCol).cast("string")).as("_k"))
      .withColumn("_b",
        expr(s"CAST(CAST(conv(substring(_k, 1, 8), 16, 10) AS BIGINT) " +
          s"* ${nb}L div 4294967296L AS INT)"))
    // pass 1: bucket histogram — map-side partial, ≤ nb rows collected
    val counts = keyed.groupBy(col("_b")).agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (b, n) => val o = acc; acc += n; (b, o) }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("_b", "_off")
    // pass 2: parallel per-bucket windows + offset = exact global rank
    val w = Window.partitionBy(col("_b")).orderBy(col("_k"), col(idCol))
    keyed.join(broadcast(offDf), "_b")
      .withColumn("pos",
        row_number().over(w).cast("long") - lit(1L) + col("_off"))
      .select(col(idCol), col("pos"),
        expr(s"pos div ${shardSize}L").as("shard"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Shuffled shard manifest for the document corpus: 64-doc shards in
    // md5 order. 32 buckets here (the session's shuffle parallelism);
    // the oracle's single global window proves the distributed rank is
    // the exact same permutation.
    "q122_shuffle_shards" -> ((s, d) =>
      shuffleShards(Tables.documents(s, d).select(col("doc_id")),
        "doc_id", shardSize = 64L, nBuckets = 32)
        .orderBy(col("doc_id"))))

  def oracle: Map[String, String] = Map(
    "q122_shuffle_shards" ->
      """WITH r AS (
           SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS k
           FROM documents),
         p AS (
           SELECT doc_id,
             row_number() OVER (ORDER BY k, doc_id) - 1 AS pos
           FROM r)
         SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           CAST(pos // 64 AS BIGINT) AS shard
         FROM p ORDER BY doc_id""")
}
