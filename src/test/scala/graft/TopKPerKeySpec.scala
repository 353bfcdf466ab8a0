package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{TopKPerKey, TopKPerKeyExec}

/** The native rank-only top-k-per-key plan (graft/plans/TopKPerKey.scala):
  * result-identical to the row_number window form under a total order,
  * and — the reason it exists — the qid exchange carries only the
  * map-side-surviving ≤ k rows per (key, task), not every input row. */
class TopKPerKeySpec extends SparkSpecBase {
  import spark.implicits._

  private def windowForm(df: DataFrame, k: Int): Set[Seq[Any]] = {
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
    df.withColumn("rn", row_number().over(w)).filter($"rn" <= k)
      .collect().map(_.toSeq).toSet
  }

  private def nativeForm(df: DataFrame, k: Int): Set[Seq[Any]] =
    TopKPerKey(df, Seq("key"), Seq($"score".desc, $"id"), k)
      .collect().map(_.toSeq).toSet

  test("equals the window form: random keys, duplicate scores, null keys/scores") {
    val rnd = new scala.util.Random(31L)
    val rows = (0 until 20000).map { i =>
      val key: java.lang.Long =
        if (i % 97 == 0) null else java.lang.Long.valueOf(rnd.nextInt(40).toLong)
      val score: java.lang.Integer =
        if (i % 113 == 0) null else java.lang.Integer.valueOf(rnd.nextInt(50))
      (key, score, i.toLong)
    }
    val df = rows.toDF("key", "score", "id").repartition(7)
    for (k <- Seq(1, 3, 17)) {
      assert(nativeForm(df, k) == windowForm(df, k), s"diverged at k=$k")
    }
  }

  test("float keys: -0.0/0.0 and NaN group exactly like the window form") {
    // NormalizeFloatingNumbers only rewrites BUILT-IN nodes' keys; the
    // entry point must normalize explicitly or byte-compare splits
    // ordering-equal keys (regression for the round-12c review finding)
    val rows = Seq(
      (0.0, 5, 1L), (-0.0, 9, 2L), (0.0, 7, 3L), (-0.0, 3, 4L),
      (Double.NaN, 8, 5L), (Double.NaN, 6, 6L), (1.5, 4, 7L))
    val df = rows.toDF("key", "score", "id").repartition(4)
    // canonicalize for the comparison only — Scala's == on boxed
    // doubles keeps NaN != NaN
    def canon(s: Set[Seq[Any]]): Set[Seq[Any]] = s.map(_.map {
      case d: java.lang.Double =>
        java.lang.Long.valueOf(java.lang.Double.doubleToLongBits(d + 0.0))
      case v => v })
    for (k <- Seq(1, 2)) {
      assert(canon(nativeForm(df, k)) == canon(windowForm(df, k)),
        s"float keys diverged from the window form at k=$k")
    }
  }

  test("k past the group size emits whole groups with dense ranks") {
    val df = Seq((1L, 5, 1L), (1L, 5, 2L), (2L, 9, 3L)).toDF("key", "score", "id")
    assert(nativeForm(df, 10) == windowForm(df, 10))
    assert(TopKPerKey(df.filter($"key" < 0), Seq("key"), Seq($"id"), 2).count() == 0)
    // name resolution honors spark.sql.caseSensitive=false like the
    // rest of the DataFrame API
    assert(TopKPerKey(df, Seq("KEY"), Seq($"id"), 1).count() == 2)
  }

  test("plan shape: partial and final execs around exactly one exchange") {
    // AQE off: the adaptive wrapper is a leaf to collect(), hiding the
    // plan until execution
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Seq((1L, 1, 1L)).toDF("key", "score", "id")
      val qe = TopKPerKey(df, Seq("key"), Seq($"score".desc, $"id"), 2)
        .queryExecution
      val execs = qe.executedPlan.collect { case t: TopKPerKeyExec => t }
      assert(execs.length == 2, s"expected partial+final:\n${qe.executedPlan}")
      assert(execs.count(_.rankAttr.isDefined) == 1, "exactly one final phase")
      val exchanges = qe.executedPlan.collect { case e: ShuffleExchangeLike => e }
      assert(exchanges.length == 1,
        s"expected one exchange between the phases:\n${qe.executedPlan}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("the partial phase bounds the exchange: shuffle rows <= k * keys * tasks, < input") {
    // 40k rows, 10 keys, 8 input tasks, k=2 — the window form would
    // shuffle all 40k rows to the key reducers; the native partial must
    // put at most k*keys*tasks = 160 on the wire. AQE off so the
    // exchange is a plain plan node with readable metrics (query
    // stages are leaves to collect()).
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val rnd = new scala.util.Random(7L)
      val df = (0 until 40000)
        .map(i => (rnd.nextInt(10).toLong, rnd.nextInt(100000), i.toLong))
        .toDF("key", "score", "id").repartition(8)
      val out = TopKPerKey(df, Seq("key"), Seq($"score".desc, $"id"), 2)
      // collect(), not count(): count() plans its OWN query execution,
      // leaving this one's exchange metrics untouched
      assert(out.collect().length == 20)
      val ex = out.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeLike
            if e.child.collectFirst { case t: TopKPerKeyExec => t }.isDefined => e
      }
      assert(ex.length == 1, s"expected the one qid exchange:\n${out.queryExecution.executedPlan}")
      val rows = ex.head.metrics("shuffleRecordsWritten").value
      assert(rows > 0 && rows <= 2L * 10 * 8,
        s"partial did not bound the shuffle: $rows rows on the wire")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
