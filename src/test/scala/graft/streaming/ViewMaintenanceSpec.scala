package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.functions.Exact.dec

case class MvOrder(o_orderkey: Long, o_orderstatus: String,
                   o_orderdate: Timestamp, o_totalprice: Double)

class ViewMaintenanceSpec extends SparkSpecBase {

  private def ord(k: Long, st: String, date: String, price: Double) =
    MvOrder(k, st, Timestamp.valueOf(s"$date 00:00:00"), price)

  private def viewAsMap(dir: String): Map[(String, Long), (BigDecimal, Long)] =
    ViewMaintenance.currentView(spark, dir).get.collect()
      .map(r => (r.getAs[String]("o_orderstatus"), r.getAs[Long]("yr")) ->
        (BigDecimal(r.getAs[java.math.BigDecimal]("rev")), r.getAs[Long]("n")))
      .toMap

  private def fullRecompute(rows: Seq[MvOrder]): Map[(String, Long), (BigDecimal, Long)] = {
    implicit val s = spark
    import s.implicits._
    rows.toDS().toDF()
      .groupBy(col("o_orderstatus"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (BigDecimal(r.getAs[java.math.BigDecimal]("rev")), r.getLong(3)))
      .toMap
  }

  test("view tracks the stream: after each batch, view == full recompute") {
    implicit val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("mv_view").toString
    val ckpt = Files.createTempDirectory("mv_ckpt").toString
    val input = MemoryStream[MvOrder](spark)
    val q = ViewMaintenance.maintain(input.toDF(), dir, ckpt)
    val b1 = Seq(ord(1, "O", "1997-01-10", 100.5), ord(2, "F", "1997-06-01", 50.25),
      ord(3, "O", "1998-02-02", 10.0))
    val b2 = Seq(ord(4, "O", "1997-03-03", 99.5), ord(5, "P", "1998-05-05", 7.75))
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(viewAsMap(dir) == fullRecompute(b1))
      input.addData(b2: _*)
      q.processAllAvailable()
      // the merge only saw b2's partial, but the view equals a full
      // recompute over everything — the q97 algebra, streaming
      assert(viewAsMap(dir) == fullRecompute(b1 ++ b2))
    } finally q.stop()
  }

  test("snapshot GC bounds storage; latest-batch replay still finds its base") {
    implicit val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("mv_gc").toString
    val batches = (0L to 5L).map(i =>
      i -> Seq(ord(i * 10 + 1, "O", "1997-01-10", 10.0 + i)))
    batches.foreach { case (id, rows) =>
      ViewMaintenance.mergeBatch(rows.toDS().toDF(), id, dir, retainVersions = 2)
    }
    val left = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("v=")).map(_.drop(2).toLong).sorted
    assert(left.toSeq == Seq(4L, 5L), s"GC must keep newest 2, kept: $left")
    assert(viewAsMap(dir) == fullRecompute(batches.flatMap(_._2)))
    // crash-and-replay of the LATEST batch: its base (v=4) must survive GC
    ViewMaintenance.mergeBatch(batches.last._2.toDS().toDF(), 5L, dir,
      retainVersions = 2)
    assert(viewAsMap(dir) == fullRecompute(batches.flatMap(_._2)))
  }

  test("batch replay is idempotent: same batchId never double-counts") {
    implicit val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("mv_replay").toString
    val base = Seq(ord(1, "O", "1997-01-10", 100.0))
    val dup = Seq(ord(2, "O", "1997-04-04", 25.0))
    ViewMaintenance.mergeBatch(base.toDS().toDF(), 0L, dir)
    ViewMaintenance.mergeBatch(dup.toDS().toDF(), 1L, dir)
    val after = viewAsMap(dir)
    // crash-and-replay of batch 1: same base (v=0), same destination
    ViewMaintenance.mergeBatch(dup.toDS().toDF(), 1L, dir)
    assert(viewAsMap(dir) == after)
    assert(after == fullRecompute(base ++ dup))
  }
}
