package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ExportOps

/** Deterministic shuffle-shard export (operators/ExportOps.scala): the
  * distributed two-pass rank must equal the naive single-partition global
  * window EXACTLY, for any bucket count (bucketing is parallelism, never
  * semantics), and its plan must not contain the single-partition
  * exchange the naive form needs. */
class ExportOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val ids: DataFrame =
    ((1L to 97L) ++ Seq(1000000L, -5L, 0L)).toDF("id")

  /** The naive form: the one window shape that cannot scale. */
  private def naive(df: DataFrame, shardSize: Long): DataFrame = {
    val w = Window.orderBy(col("_k"), col("id"))
    df.withColumn("_k", md5(col("id").cast("string")))
      .withColumn("pos", row_number().over(w).cast("long") - lit(1L))
      .select(col("id"), col("pos"),
        expr(s"pos div ${shardSize}L").as("shard"))
  }

  private def asMap(df: DataFrame): Map[Long, (Long, Long)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("distributed rank ≡ global window at every bucket count") {
    val exp = asMap(naive(ids, 10L))
    // nBuckets ∈ {1 (degenerate), 7, 32, 4096 (mostly empty)} — identical
    for (nb <- Seq(1, 7, 32, 4096)) {
      val got = asMap(ExportOps.shuffleShards(ids, "id", 10L, nBuckets = nb))
      assert(got == exp, s"nBuckets=$nb diverged from the global window")
    }
  }

  test("pos is a permutation; shards are exact-size except the last") {
    val out = ExportOps.shuffleShards(ids, "id", 16L, nBuckets = 8).collect()
    val n = out.length.toLong
    assert(out.map(_.getLong(1)).sorted.toSeq == (0L until n),
      "pos must be a permutation of 0..N-1")
    val sizes = out.groupBy(_.getLong(2)).view.mapValues(_.length.toLong)
      .toMap
    val full = (0L until n / 16L).map(s => s -> 16L).toMap
    val tail = if (n % 16L == 0L) Map.empty[Long, Long]
      else Map(n / 16L -> n % 16L)
    assert(sizes == full ++ tail, s"shard sizes off: $sizes")
  }

  test("the rank is run-to-run deterministic (an export must be replayable)") {
    val a = asMap(ExportOps.shuffleShards(ids, "id", 10L, nBuckets = 16))
    val b = asMap(ExportOps.shuffleShards(
      ids.repartition(13), "id", 10L, nBuckets = 16))
    assert(a == b, "input partitioning leaked into the output permutation")
  }

  test("loud guards: bad shardSize / nBuckets / id column") {
    intercept[IllegalArgumentException] {
      ExportOps.shuffleShards(ids, "id", 0L)
    }
    intercept[IllegalArgumentException] {
      ExportOps.shuffleShards(ids, "id", 10L, nBuckets = 1 << 25)
    }
    intercept[IllegalArgumentException] { // missing id column
      ExportOps.shuffleShards(ids, "nope", 10L)
    }
    intercept[IllegalArgumentException] { // reserved-name collision
      ExportOps.shuffleShards(ids.withColumnRenamed("id", "pos"), "pos", 10L)
    }
  }

  test("q122 plan: no single-partition exchange; the naive form needs one") {
    val dist = ExportOps.shuffleShards(ids, "id", 10L, nBuckets = 8)
    val dp = dist.queryExecution.executedPlan.toString
    assert(!dp.contains("SinglePartition"),
      s"distributed rank funneled through one partition:\n$dp")
    val np = naive(ids, 10L).queryExecution.executedPlan.toString
    assert(np.contains("SinglePartition"),
      s"expected the naive global window to single-partition:\n$np")
    // end-to-end on the corpus: same permutation law at the test SF
    val rows = SparkEntry.queries("q122_shuffle_shards")(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sorted.toSeq ==
      (0L until rows.length.toLong), "corpus pos not a permutation")
  }
}
