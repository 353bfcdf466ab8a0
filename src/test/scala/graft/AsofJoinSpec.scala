package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

import graft.plans.{AsofJoin, AsofJoinExec}

/** The native as-of join (graft/plans/AsofJoin.scala): checked against
  * a driver-side brute-force reference over hostile data — null keys,
  * null timestamps, duplicate right (key, ts) rows, keys on one side
  * only — in both join modes, across multiple partitions. */
class AsofJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val leftSchema = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("lts", LongType, nullable = true),
    StructField("lid", LongType, nullable = false)))
  private val rightSchema = StructType(Seq(
    StructField("rk", LongType, nullable = true),
    StructField("rts", LongType, nullable = true),
    StructField("rid", LongType, nullable = false),
    StructField("payload", StringType, nullable = true)))

  /** brute force: the right row with max (rts, rid) among rts <= lts. */
  private def expected(lefts: Seq[(Option[Long], Option[Long], Long)],
      rights: Seq[(Option[Long], Option[Long], Long, String)],
      outer: Boolean): Set[Seq[Any]] =
    lefts.flatMap { case (k, lts, lid) =>
      val m = (for {
        kk <- k.toSeq; ts <- lts.toSeq
        r <- rights
        rk <- r._1.toSeq if rk == kk
        rts <- r._2.toSeq if rts <= ts
      } yield r).sortBy(r => (r._2.get, r._3)).lastOption
      m match {
        case Some(r) => Some(Seq[Any](k.orNull, lts.orNull, lid,
          r._1.get, r._2.get, r._3, r._4))
        case None if outer => Some(Seq[Any](k.orNull, lts.orNull, lid,
          null, null, null, null))
        case None => None
      }
    }.toSet

  private def dfs(lefts: Seq[(Option[Long], Option[Long], Long)],
      rights: Seq[(Option[Long], Option[Long], Long, String)]) = {
    val l = spark.createDataFrame(
      spark.sparkContext.parallelize(lefts.map(t =>
        Row(t._1.orNull, t._2.orNull, t._3)), 5), leftSchema)
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(rights.map(t =>
        Row(t._1.orNull, t._2.orNull, t._3, t._4)), 3), rightSchema)
    (l, r)
  }

  private def run(lefts: Seq[(Option[Long], Option[Long], Long)],
      rights: Seq[(Option[Long], Option[Long], Long, String)],
      mode: String): Set[Seq[Any]] = {
    val (l, r) = dfs(lefts, rights)
    AsofJoin(l, r, Seq("k"), Seq("rk"), "lts", "rts",
      rightTie = Seq(col("rid")), joinType = mode)
      .collect().map(_.toSeq).toSet
  }

  test("matches brute force on hostile random data, both modes") {
    val rnd = new scala.util.Random(83L)
    def optKey(): Option[Long] =
      if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(12).toLong)
    def optTs(): Option[Long] =
      if (rnd.nextInt(25) == 0) None else Some(rnd.nextInt(40).toLong)
    val lefts = (0 until 600).map(i => (optKey(), optTs(), i.toLong))
    // duplicate (rk, rts) pairs are likely at these ranges — the rid
    // tie-break must decide them; key 99 exists on the right only
    val rights = (0 until 400).map(i =>
      (if (i % 37 == 0) Some(99L) else optKey(), optTs(), i.toLong, s"p$i"))
    for (mode <- Seq("left_outer", "inner")) {
      val got = run(lefts, rights, mode)
      val want = expected(lefts, rights, mode == "left_outer")
      assert(got == want, s"diverged in $mode: " +
        s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    }
  }

  test("empty sides and all-null keys degrade cleanly") {
    val lefts = Seq((Some(1L), Some(5L), 1L), (None, Some(5L), 2L))
    val rights = Seq.empty[(Option[Long], Option[Long], Long, String)]
    assert(run(lefts, rights, "left_outer").size == 2)
    assert(run(lefts, rights, "inner").isEmpty)
    val rOnly = Seq((Some(1L), Some(1L), 1L, "x"))
    assert(run(Seq.empty, rOnly, "left_outer").isEmpty)
  }

  test("plan: one AsofJoinExec, co-clustered exchanges, no window, no cartesian") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (l, r) = dfs(Seq((Some(1L), Some(1L), 1L)),
        Seq((Some(1L), Some(1L), 1L, "x")))
      val qe = AsofJoin(l, r, Seq("k"), Seq("rk"), "lts", "rts",
        rightTie = Seq(col("rid"))).queryExecution
      val p = qe.executedPlan
      assert(p.collect { case a: AsofJoinExec => a }.length == 1)
      val s = p.toString
      assert(!s.contains("Window") && !s.contains("CartesianProduct"),
        s"unexpected operator:\n$s")
      assert(s.contains("hashpartitioning(k#") &&
        s.contains("hashpartitioning(rk#"),
        s"both sides must hash-cluster on their keys:\n$s")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
