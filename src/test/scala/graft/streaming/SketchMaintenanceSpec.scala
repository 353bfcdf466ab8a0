package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

case class SkRow(grp: String, key: Long)

class SketchMaintenanceSpec extends SparkSpecBase {

  private def counts(dir: String): Map[String, Long] =
    SketchMaintenance.currentCounts(spark, dir).get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("streamed sketch view estimates distinct keys across batches") {
    implicit val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("sk_view").toString
    val ckpt = Files.createTempDirectory("sk_ckpt").toString
    val input = MemoryStream[SkRow](spark)
    val q = SketchMaintenance.maintain(input.toDF(), dir, ckpt)
    // batches OVERLAP on purpose: keys 0-599 then 300-899 — a
    // sum-of-counts view would report 1200, distinct is 900
    try {
      input.addData((0L until 600L).map(k => SkRow(if (k % 2 == 0) "a" else "b", k)): _*)
      q.processAllAvailable()
      input.addData((300L until 900L).map(k => SkRow(if (k % 2 == 0) "a" else "b", k)): _*)
      q.processAllAvailable()
      val c = counts(dir)
      // 450 distinct per group; HLL lgK=12 standard error ~1.6%
      assert(c.keySet == Set("a", "b"))
      c.values.foreach(est => assert(math.abs(est - 450.0) / 450.0 < 0.05,
        s"estimate $est too far from 450"))
    } finally q.stop()
  }

  test("sketch replay is idempotent and estimate equals one-shot sketch") {
    implicit val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("sk_replay").toString
    val b0 = (0L until 500L).map(k => SkRow("g", k))
    val b1 = (250L until 750L).map(k => SkRow("g", k))
    SketchMaintenance.mergeBatch(b0.toDS().toDF(), 0L, dir)
    SketchMaintenance.mergeBatch(b1.toDS().toDF(), 1L, dir)
    val after = counts(dir)
    // crash-and-replay of batch 1: same base (v=0), same destination
    SketchMaintenance.mergeBatch(b1.toDS().toDF(), 1L, dir)
    assert(counts(dir) == after, "replay must not change the view")
    // merged-sketch estimate tracks the one-shot sketch within HLL error
    // (union of partials is NOT bit-identical to direct aggregation —
    // sparse-mode compaction differs — but both estimate the same set;
    // true distinct = 750, lgK=12 standard error ~1.6%)
    val oneShot = (b0 ++ b1).toDS().toDF()
      .agg(hll_sketch_estimate(hll_sketch_agg(col("key"), lit(12))))
      .head().getLong(0)
    assert(math.abs(after("g") - 750.0) / 750.0 < 0.05,
      s"merged ${after("g")} too far from exact 750")
    assert(math.abs(after("g") - oneShot.toDouble) / 750.0 < 0.05,
      s"merged ${after("g")} diverges from one-shot $oneShot")
  }

  test("snapshot GC keeps the newest versions only") {
    implicit val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("sk_gc").toString
    (0L to 4L).foreach { i =>
      SketchMaintenance.mergeBatch(
        Seq(SkRow("g", i)).toDS().toDF(), i, dir, retainVersions = 2)
    }
    val left = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("v=")).map(_.drop(2).toLong).sorted
    assert(left.toSeq == Seq(3L, 4L))
    assert(counts(dir)("g") == 5L) // tiny set: HLL is exact
  }
}
