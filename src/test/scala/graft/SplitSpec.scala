package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Leakage-safe splitting (q126): the split must be a pure function of
  * the near-dup CLUSTER — so a near-duplicate pair whose doc-level hash
  * buckets straddle a split boundary (the leak a naive doc-level split
  * commits) still lands in ONE split — and singleton docs must land
  * exactly where the md5-bucket formula says. */
class SplitSpec extends SparkSpecBase {
  import spark.implicits._

  /** The q55/q126 md5-bucket convention, reimplemented independently. */
  private def bucket(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % 100
  }
  private def splitOf(b: Long): String =
    if (b < 90) "train" else if (b < 95) "val" else "test"

  private def runSplit(docs: Seq[(Long, String)]): Map[Long, (Long, String)] = {
    val bucketCol = conv(
      substring(md5(col("cluster").cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    TextOps.clusterAssignments(docs.toDF("doc_id", "text"))
      .withColumn("split",
        when(bucketCol < 90, lit("train"))
          .when(bucketCol < 95, lit("val"))
          .otherwise(lit("test")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
  }

  test("a near-dup pair straddling a doc-level boundary stays together") {
    // find two ids whose DOC-level buckets fall in different splits —
    // the pair a doc-level 90/5/5 split would tear apart
    val ids = (1L to 500L)
    val i = ids.find(x => splitOf(bucket(x)) == "train").get
    val j = ids.find(x => splitOf(bucket(x)) == "test").get
    assert(splitOf(bucket(i)) != splitOf(bucket(j)), "need a straddling pair")
    val dupText = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(i -> dupText, j -> dupText,
      1000L -> "totally unrelated words here filler tokens one two three four")
    val got = runSplit(docs)
    assert(got(i)._1 == got(j)._1, "exact duplicates must share a cluster")
    assert(got(i)._2 == got(j)._2,
      s"near-dup pair split apart: $i -> ${got(i)}, $j -> ${got(j)}")
  }

  test("split is a pure function of the cluster id") {
    val docs = (1L to 30L).map(i =>
      i -> s"unique${i}alpha unique${i}beta unique${i}gamma unique${i}delta unique${i}epsilon")
    val got = runSplit(docs)
    got.groupBy(_._2._1).foreach { case (c, members) =>
      assert(members.values.map(_._2).toSet.size == 1,
        s"cluster $c spans multiple splits")
    }
  }

  test("singleton clusters land exactly where the md5 formula says") {
    val docs = (1L to 40L).map(i =>
      i -> s"lone${i}a lone${i}b lone${i}c lone${i}d lone${i}e lone${i}f")
    val got = runSplit(docs)
    for ((id, (cluster, split)) <- got if cluster == id)
      assert(split == splitOf(bucket(id)),
        s"doc $id: got $split, formula says ${splitOf(bucket(id))}")
    // the corpus is engineered all-singleton; the invariant must not
    // have held vacuously
    assert(got.count { case (id, (c, _)) => c == id } == docs.size)
  }

  test("q126 at the test SF: deterministic, every doc assigned, ordered") {
    val df = SparkEntry.queries("q126_split_leakage_safe")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("train", "val", "test")(r.getString(2))))
    val ids = rows.map(_.getLong(0))
    assert(ids.sameElements(ids.sorted), "output must be doc_id-ordered")
  }
}
