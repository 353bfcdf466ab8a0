package graft

import org.apache.spark.sql.functions._

import graft.plans.{AsofJoin, AsofJoinExec, BroadcastAsofJoinExec}

/** The native as-of join (graft/plans/AsofJoin.scala): checked against
  * a driver-side brute-force reference over hostile data — null keys,
  * null timestamps, duplicate right (key, ts) rows, keys on one side
  * only — in both join modes, across multiple partitions. */
class AsofJoinSpec extends SparkSpecBase {
  import spark.implicits._

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

  // LocalRelation-backed (toDF) so stats are COMPUTABLE: the default
  // threshold then really broadcasts the small right side (an
  // RDD-backed side reports defaultSizeInBytes and silently stays on
  // the merge path); the repartitions spread both sides across tasks
  // for the merge path
  private def dfs(lefts: Seq[(Option[Long], Option[Long], Long)],
      rights: Seq[(Option[Long], Option[Long], Long, String)]) = {
    val l = lefts.toDF("k", "lts", "lid").repartition(5)
    val r = rights.toDF("rk", "rts", "rid", "payload").repartition(3)
    (l, r)
  }

  /** toggle the stats-driven physical path: default threshold
    * broadcasts these tiny right sides; -1 forces the shuffled merge. */
  private def withPath[T](path: String)(body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, if (path == "merge") "-1" else prev)
    try body finally spark.conf.set(key, prev)
  }

  private def run(lefts: Seq[(Option[Long], Option[Long], Long)],
      rights: Seq[(Option[Long], Option[Long], Long, String)],
      mode: String, wantBroadcast: Option[Boolean] = None): Set[Seq[Any]] = {
    val (l, r) = dfs(lefts, rights)
    val df = AsofJoin(l, r, Seq("k"), Seq("rk"), "lts", "rts",
      rightTie = Seq(col("rid")), joinType = mode)
    val out = df.collect().map(_.toSeq).toSet
    // guard against silently exercising the same physical path twice
    wantBroadcast.foreach { want =>
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("BroadcastAsofJoin") == want,
        s"wrong physical path (wantBroadcast=$want):\n$s")
    }
    out
  }

  test("matches brute force on hostile random data, both modes, both physical paths") {
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
    for (path <- Seq("broadcast", "merge"); mode <- Seq("left_outer", "inner")) {
      val got = withPath(path) {
        run(lefts, rights, mode, Some(path == "broadcast")) }
      val want = expected(lefts, rights, mode == "left_outer")
      assert(got == want, s"diverged in $mode/$path: " +
        s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    }
  }

  test("float keys, self-join exprIds, and type drift (round-12c review regressions)") {
    // -0.0/0.0 keys must match identically on BOTH physical paths
    // (broadcast indexes by byte-equality HashMap, merge compares by
    // ordering — normalization at the entry point reconciles them)
    val l = Seq((0.0, 10L, 1L), (-0.0, 20L, 2L), (1.5, 10L, 3L))
      .toDF("k", "lts", "lid")
    val r = Seq((-0.0, 5L, 7L, "a"), (0.0, 15L, 8L, "b"))
      .toDF("rk", "rts", "rid", "payload")
    val want = Set(
      Seq[Any](0.0, 10L, 1L, 0.0, 5L, 7L, "a"),
      Seq[Any](-0.0, 20L, 2L, 0.0, 15L, 8L, "b"),
      Seq[Any](1.5, 10L, 3L, null, null, null, null))
    for (path <- Seq("broadcast", "merge")) withPath(path) {
      val df = AsofJoin(l, r, Seq("k"), Seq("rk"), "lts", "rts",
        rightTie = Seq(col("rid")))
      val got = df.collect().map(_.toSeq).toSet
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("BroadcastAsofJoin") == (path == "broadcast"),
        s"wrong physical path:\n$s")
      // compare on normalized key bytes: the engine (like Spark's own
      // normalized joins) is free to emit 0.0 for a -0.0 key
      def norm(x: Seq[Any]) = x.map {
        case d: java.lang.Double => java.lang.Double.valueOf(d + 0.0)
        case v => v }
      assert(got.map(norm) == want.map(norm), s"float keys diverged on $path: $got")
    }
    // a self-derived right side shares the LEFT's exprIds (no rename —
    // toDF would mint fresh ids and mask the hazard): the entry point
    // must re-alias it, not silently project right columns onto the
    // left's ordinals
    val base = Seq((1L, 10L, 100L), (1L, 5L, 200L)).toDF("k", "ts", "v")
    val selfJoined = AsofJoin(
      base.filter(col("v") === 100L),
      base.filter(col("v") === 200L),
      Seq("k"), Seq("k"), "ts", "ts").collect()
    assert(selfJoined.map(_.toSeq).toSet ==
      Set(Seq[Any](1L, 10L, 100L, 1L, 5L, 200L)),
      s"self-join emitted corrupted rows: ${selfJoined.toSeq}")
    // mismatched key/ts types fail loudly instead of mis-comparing
    val rInt = Seq((1, 5L, 7L, "a")).toDF("rk", "rts", "rid", "payload")
    val ex = intercept[IllegalArgumentException] {
      AsofJoin(Seq((1L, 10L, 1L)).toDF("k", "lts", "lid"), rInt,
        Seq("k"), Seq("rk"), "lts", "rts")
    }
    assert(ex.getMessage.contains("type mismatch"))
  }

  test("empty sides and all-null keys degrade cleanly (both physical paths)") {
    for (path <- Seq("broadcast", "merge")) withPath(path) {
      val lefts = Seq((Some(1L), Some(5L), 1L), (None, Some(5L), 2L))
      val rights = Seq.empty[(Option[Long], Option[Long], Long, String)]
      assert(run(lefts, rights, "left_outer").size == 2)
      assert(run(lefts, rights, "inner").isEmpty)
      val rOnly = Seq((Some(1L), Some(1L), 1L, "x"))
      assert(run(Seq.empty, rOnly, "left_outer").isEmpty)
    }
  }

  test("plan: merge path co-clusters both sides; no window, no cartesian") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try withPath("merge") {
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
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("plan: small right broadcasts and the left side never shuffles or sorts") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // LocalRelation inputs: the stats-driven choice needs a computable
      // right size (an RDD-backed side reports defaultSizeInBytes and
      // correctly stays on the merge path)
      val l = Seq((1L, 1L, 1L)).toDF("k", "lts", "lid")
      val r = Seq((1L, 1L, 1L, "x")).toDF("rk", "rts", "rid", "payload")
      val qe = AsofJoin(l, r, Seq("k"), Seq("rk"), "lts", "rts",
        rightTie = Seq(col("rid"))).queryExecution
      val p = qe.executedPlan
      assert(p.collect { case b: BroadcastAsofJoinExec => b }.length == 1,
        s"expected the broadcast variant under the default threshold:\n$p")
      val s = p.toString
      assert(!s.contains("hashpartitioning") && !s.contains("Sort"),
        s"the broadcast path must leave the left side untouched:\n$s")
      assert(s.contains("BroadcastExchange"), s"no broadcast exchange:\n$s")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("graft_asof TVF: SQL plans the native node, rows ≡ DataFrame surface") {
    val lefts = Seq[(Option[Long], Option[Long], Long)](
      (Some(1L), Some(10L), 1L), (Some(1L), Some(20L), 2L),
      (Some(2L), Some(15L), 3L), (Some(3L), Some(5L), 4L),
      (None, Some(9L), 5L), (Some(1L), None, 6L))
    val rights = Seq[(Option[Long], Option[Long], Long, String)](
      (Some(1L), Some(10L), 1L, "a"), (Some(1L), Some(10L), 2L, "b"),
      (Some(1L), Some(18L), 3L, "c"), (Some(2L), Some(16L), 4L, "d"),
      (None, Some(1L), 5L, "e"), (Some(3L), None, 6L, "f"))
    val (l, r) = dfs(lefts, rights)
    l.createOrReplaceTempView("asof_tvf_l")
    r.createOrReplaceTempView("asof_tvf_r")
    for (mode <- Seq("left_outer", "inner")) {
      val df = spark.sql(
        s"""SELECT * FROM graft_asof('asof_tvf_l', 'asof_tvf_r',
           |  'k', 'rk', 'lts', 'rts', 'rid', '$mode')""".stripMargin)
      // the TVF plans the SAME whole-operator node as the DataFrame
      // surface — one of the two physical variants, never a window
      // fallback or a nested loop (string pin: AQE wraps the tree in
      // an AdaptiveSparkPlan whose children a collect can't see until
      // execution)
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("AsofJoin"),
        s"TVF did not plan the native as-of:\n$s")
      assert(!s.contains("BroadcastNestedLoopJoin") &&
        !s.contains("CartesianProduct") && !s.contains("Window"),
        s"TVF fell back off the native path:\n$s")
      assert(df.collect().map(_.toSeq).toSet ==
        expected(lefts, rights, outer = mode == "left_outer"),
        s"TVF rows diverged from brute force in $mode")
    }
    // multi-key lists parse and bind: (k, k) vs (rk, rk) is the same
    // join — rows must not change
    assert(spark.sql(
        """SELECT * FROM graft_asof('asof_tvf_l', 'asof_tvf_r',
          |  'k, k', 'rk, rk', 'lts', 'rts', 'rid')""".stripMargin)
      .collect().map(_.toSeq).toSet ==
      expected(lefts, rights, outer = true))
  }

  test("graft_asof TVF: loud contracts on bad arguments") {
    Seq((1L, 1L)).toDF("k", "lts").createOrReplaceTempView("asof_tvf_l2")
    Seq((1L, 1L)).toDF("rk", "rts").createOrReplaceTempView("asof_tvf_r2")
    def bad(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage != null && e.getMessage.contains(needle),
        s"wanted `$needle` in: ${e.getMessage}")
    }
    bad("SELECT * FROM graft_asof('asof_tvf_l2', 'asof_tvf_r2', 'k')",
      "6-8 string arguments")
    bad("""SELECT * FROM graft_asof('asof_tvf_l2', 'asof_tvf_r2',
         |  'k', 'rk', 'lts', 'rts', '', 'full_outer')""".stripMargin,
      "inner | left_outer")
    bad("""SELECT * FROM graft_asof('asof_tvf_l2', 'asof_tvf_r2',
         |  'nope', 'rk', 'lts', 'rts')""".stripMargin,
      "not in")
    bad("""SELECT * FROM graft_asof('asof_tvf_l2', 'asof_tvf_r2',
         |  'k, k', 'rk', 'lts', 'rts')""".stripMargin,
      "same length")
  }
}
