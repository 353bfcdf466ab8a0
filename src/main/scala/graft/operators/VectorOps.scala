package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.functions.{VectorFns => V}

/** Similarity search over the `embeddings` table (SURVEY.md §2.11).
  *
  * Scale design: brute-force top-k is the correctness baseline — a
  * broadcast of the (small) query set against a map-only scan of the
  * corpus, then a per-query top-k window. The IVF variant prunes the scan
  * with a coarse quantizer (centroid assignment) so each query probes only
  * `nprobe` partitions — the standard billion-scale ANN layout; on a real
  * cluster the corpus would be written bucketed by `cell` so a probe is a
  * partition-pruned read, not a shuffle.
  */
object VectorOps {

  /** Brute-force exact-decimal dot-product top-k (oracle-verified). */
  def dotTopK(s: SparkSession, d: String, nQueries: Int = 5, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    // spread: the decimal dot products run on the corpus scan's partitions
    val c = Tables.spread(e.select(col("vec_id"), col("embedding")))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("dot", V.dotExact(col("qv"), col("embedding")))
    val w = Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("dot"),
        col("rank").cast("long").as("rank"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Brute-force cosine top-k (double arithmetic — the fast path).
    * Output is rank-only: the ranking is oracle-stable (measured adjacent
    * top-k margins ≥ 2e-4, five orders above cross-engine double noise)
    * while the raw double similarity is not hash-comparable. */
  def cosineTopK(s: SparkSession, d: String, nQueries: Int = 5, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = Tables.spread(e.select(col("vec_id"), col("embedding")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    c.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("sim", graft.functions.CosineExpr.cosineFast(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank").cast("long").as("rank"))
      .orderBy(col("qid"), col("rank"))
  }

  /** IVF-style ANN: coarse centroids = per-label mean vector (the label
    * plays the role of a k-means cell id); each query probes the `nprobe`
    * nearest cells and brute-forces only within them. */
  def ivfTopK(s: SparkSession, d: String, nQueries: Int = 5, k: Int = 5,
              nprobe: Int = 3): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, d))
    // centroid per cell: elementwise mean via a typed Aggregator — ONE
    // shuffle of one (sum[64], count) buffer per key per partition.
    // (posexplode + groupBy would multiply the shuffle rows 64×.)
    val cent = e.groupBy(col("label").as("cell"))
      .agg(graft.functions.ArrayAvgAgg.arrayAvg(64)(col("embedding"))
        .as("centroid"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    // assign each query its nprobe nearest cells (centroid table is tiny);
    // cell tiebreak keeps the cut deterministic (measured margins ≥ 2.6e-4
    // make real ties impossible, but determinism is free)
    val wq = Window.partitionBy(col("qid")).orderBy(col("cdist"), col("cell"))
    val probes = q.join(broadcast(cent))
      .withColumn("cdist", V.l2(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(wq))
      .filter(col("crank") <= nprobe)
      .select(col("qid"), col("qv"), col("cell"))
    // search only the probed cells.
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    e.join(broadcast(probes), col("label") === col("cell") &&
        col("vec_id") =!= col("qid"))
      .withColumn("sim", graft.functions.CosineExpr.cosineFast(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank").cast("long").as("rank"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Embedding near-dup detection via random-hyperplane LSH bucketing,
    * cosine-verified within buckets only (never all-pairs).
    *
    * The driver corpus has no natural near-dups (max pairwise cosine ≈ 0.51
    * at sf0.01), so the query plants them deterministically: every 10th
    * vector is re-added scaled by exactly 2.0f (id + 1e6). ×2 is exact in
    * IEEE float — the copy's *direction* is bit-identical, every hyperplane
    * projection doubles exactly, so its sign (and thus the LSH bucket) is
    * provably unchanged → recall is exactly 1.0 and the result is the exact
    * planted pair set, which makes the whole LSH pipeline oracle-checkable.
    * Scale: candidate generation is a bucket-equijoin (shuffle on bucket),
    * never a cross join; verification cost ∝ bucket collisions only.
    * The bucket self-join carries ONLY (vec_id, bucket) — the 16×64-mult
    * projection runs once per row into a materialized cache instead of once
    * per join side, and the embedding arrays are never shuffled: the small
    * candidate-pair list is broadcast back onto the corpus to fetch vectors
    * for the cosine verify. */
  def cosineNearDup(s: SparkSession, d: String, bits: Int = 16,
                    threshold: Double = 0.999): DataFrame = {
    val e = Tables.embeddings(s, d)
    val planted = e.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val corpus = e.select(col("vec_id"), col("embedding")).union(planted)
    val bk = Tables.spread(corpus)
      .select(col("vec_id"), V.cosineLshBucket(col("embedding"), bits).as("bucket"))
      .persist()
    bk.count()
    val cand = bk.select(col("vec_id").as("id_a"), col("bucket"))
      .join(bk.select(col("vec_id").as("id_b"), col("bucket")), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    corpus.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
      .join(broadcast(cand), "id_a")
      .join(corpus.select(col("vec_id").as("id_b"),
        col("embedding").as("v_b")), "id_b")
      .filter(graft.functions.CosineExpr.cosineFast(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"))
      .orderBy(col("id_a"), col("id_b"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_dot_topk" -> ((s, d) => dotTopK(s, d)),
    "q41_cosine_topk" -> ((s, d) => cosineTopK(s, d)),
    "q42_ann_ivf" -> ((s, d) => ivfTopK(s, d)),
    "q43_embedding_neardup" -> ((s, d) => cosineNearDup(s, d)))

  // q40 compares exact-decimal dots; q41/q42 compare rank-only — the
  // measured margins (≥ 2e-4 between adjacent ranks and at the IVF probe
  // cut) dwarf any cross-engine double-aggregation noise (~1e-15), so the
  // orderings are engine-stable even though the raw doubles are not.
  def oracle: Map[String, String] = Map(
    "q42_ann_ivf" ->
      """WITH flat AS (
           SELECT label AS cell, vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
         cent AS (
           SELECT cell, i, avg(x) AS cx FROM flat GROUP BY cell, i),
         q AS (
           SELECT vec_id AS qid, embedding AS qv FROM embeddings
           WHERE vec_id < 5),
         qflat AS (
           SELECT qid, i, CAST(qv[i] AS DOUBLE) AS qx
           FROM q, (SELECT unnest(range(1, 65)) AS i)),
         cdist AS (
           SELECT qid, cell, sqrt(sum((qx - cx) * (qx - cx))) AS d
           FROM qflat JOIN cent USING (i) GROUP BY qid, cell),
         probes AS (
           SELECT qid, cell FROM (
             SELECT qid, cell,
               row_number() OVER (PARTITION BY qid ORDER BY d, cell) AS cr
             FROM cdist) t
           WHERE cr <= 3),
         cand AS (
           SELECT p.qid, e.vec_id,
             list_cosine_similarity(q.qv, e.embedding) AS sim
           FROM probes p
           JOIN embeddings e ON e.label = p.cell
           JOIN q ON q.qid = p.qid
           WHERE e.vec_id <> p.qid),
         ranked AS (
           SELECT qid, vec_id,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
               AS rank
           FROM cand)
         SELECT qid, vec_id, rank FROM ranked
         WHERE rank <= 5 ORDER BY qid, rank""",

    "q41_cosine_topk" ->
      """WITH q AS (
           SELECT vec_id AS qid, embedding AS qv FROM embeddings
           WHERE vec_id < 5),
         scored AS (
           SELECT qid, vec_id,
             list_cosine_similarity(qv, embedding) AS sim
           FROM q, embeddings WHERE vec_id <> qid),
         ranked AS (
           SELECT qid, vec_id,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
               AS rank
           FROM scored)
         SELECT qid, vec_id, rank FROM ranked
         WHERE rank <= 5 ORDER BY qid, rank""",

    "q40_dot_topk" ->
      """WITH q AS (
           SELECT vec_id AS qid, embedding AS qv FROM embeddings
           WHERE vec_id < 5),
         flat_q AS (
           SELECT qid, i, CAST(CAST(qv[i] AS VARCHAR) AS DECIMAL(18,9)) AS qx
           FROM q, (SELECT unnest(range(1, 65)) AS i)),
         flat_c AS (
           SELECT vec_id, i,
             CAST(CAST(embedding[i] AS VARCHAR) AS DECIMAL(18,9)) AS cx
           FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
         dots AS (
           SELECT qid, vec_id,
             -- round() is half-away-from-zero = Spark's HALF_UP decimal
             -- cast; DuckDB's own decimal downscale cast truncates, so the
             -- explicit round must come first
             CAST(CAST(round(sum(qx * cx), 12) AS DECIMAL(18,12)) AS DOUBLE)
               AS dot
           FROM flat_q JOIN flat_c USING (i)
           WHERE vec_id <> qid
           GROUP BY qid, vec_id),
         ranked AS (
           SELECT qid, vec_id, dot,
             row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id)
               AS rank
           FROM dots)
         SELECT qid, vec_id, dot, rank FROM ranked
         WHERE rank <= 5 ORDER BY qid, rank""",

    // LSH recall is provably exact for the ×2-scaled planted dups (see
    // cosineNearDup scaladoc), so the oracle is simply the planted pair set.
    "q43_embedding_neardup" ->
      """SELECT CAST(vec_id AS BIGINT) AS id_a,
                CAST(vec_id + 1000000 AS BIGINT) AS id_b
         FROM embeddings WHERE vec_id % 10 = 0 ORDER BY 1""")
}
