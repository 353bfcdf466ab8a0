package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpecBase
import graft.operators.TextOps

class IncrementalDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def docsDF(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def labelsMap(dir: String): Map[Long, Long] =
    IncrementalDedup.currentLabels(spark, dir).get.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def truth(rows: Seq[(Long, String)]): Map[Long, Long] =
    TextOps.clusterAssignments(docsDF(rows)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incremental == batch recompute after every batch (real corpus, cross-batch dups)") {
    val base = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val n = base.length
    assert(n > 30, "corpus too small to split")
    val (b1, rest) = base.splitAt(n / 3)
    val (b2, b3raw) = rest.splitAt(n / 3)
    // plant cross-batch duplicates: every 5th doc of batch 1 reappears in
    // batch 3 under a new id — the incremental path must link it to the
    // batch-1 cluster through the stored bucket index
    val planted = b1.zipWithIndex.collect {
      case ((id, t), i) if i % 5 == 0 => (id + 1000000L, t)
    }
    val b3 = b3raw ++ planted
    val dir = Files.createTempDirectory("inc_dedup").toString
    var seen = Seq.empty[(Long, String)]
    Seq(b1, b2, b3).zipWithIndex.foreach { case (batch, i) =>
      IncrementalDedup.mergeBatch(docsDF(batch), i.toLong, dir)
      seen = seen ++ batch
      assert(labelsMap(dir) == truth(seen), s"divergence after batch $i")
    }
    // the planted dups really landed in their originals' clusters
    val fin = labelsMap(dir)
    planted.foreach { case (pid, _) =>
      val orig = pid - 1000000L
      assert(fin(pid) == fin(orig), s"planted $pid not clustered with $orig")
    }
  }

  test("a later smaller-id duplicate relabels the stored cluster") {
    val dir = Files.createTempDirectory("inc_relabel").toString
    IncrementalDedup.mergeBatch(docsDF(Seq(
      (50L, "x y z w v u t s"),
      (60L, "completely different words appear here now"))), 0L, dir)
    assert(labelsMap(dir) == Map(50L -> 50L, 60L -> 60L))
    // id 7 < 50 carries the same text: the stored cluster's label must
    // DECREASE to 7 — the affected-member relabel path
    IncrementalDedup.mergeBatch(docsDF(Seq(
      (7L, "x y z w v u t s"))), 1L, dir)
    assert(labelsMap(dir) == Map(50L -> 7L, 7L -> 7L, 60L -> 60L))
  }

  test("replay of the latest batch is idempotent") {
    val dir = Files.createTempDirectory("inc_replay").toString
    val b0 = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa"))
    val b1 = Seq((3L, "alpha beta gamma delta epsilon"))
    IncrementalDedup.mergeBatch(docsDF(b0), 0L, dir)
    IncrementalDedup.mergeBatch(docsDF(b1), 1L, dir)
    val after = labelsMap(dir)
    assert(after(3L) == after(1L), "identical text must share a cluster")
    IncrementalDedup.mergeBatch(docsDF(b1), 1L, dir) // crash-and-replay
    assert(labelsMap(dir) == after, "replay must not change the state")
  }

  test("short docs without a signature label themselves") {
    val dir = Files.createTempDirectory("inc_short").toString
    IncrementalDedup.mergeBatch(docsDF(Seq(
      (10L, "hi"), (11L, "alpha beta gamma delta"))), 0L, dir)
    val m = labelsMap(dir)
    assert(m(10L) == 10L && m(11L) == 11L)
  }

  test("maintain(): streamed batches land in the versioned state") {
    implicit val s = spark
    val dir = Files.createTempDirectory("inc_stream").toString
    val ckpt = Files.createTempDirectory("inc_ckpt").toString
    val input = MemoryStream[(Long, String)](spark)
    val q = IncrementalDedup.maintain(
      input.toDF().toDF("doc_id", "text"), dir, ckpt)
    try {
      input.addData((1L, "one two three four five"))
      q.processAllAvailable()
      input.addData((9L, "one two three four five"))
      q.processAllAvailable()
      val m = labelsMap(dir)
      assert(m == Map(1L -> 1L, 9L -> 1L))
    } finally q.stop()
  }
}
