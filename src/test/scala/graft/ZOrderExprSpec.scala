package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrderExpr

class ZOrderExprSpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  test("zorder2 equals the higher-order-aggregate interleave on 10-bit inputs") {
    val cases = (1 to 500).map(_ => (rnd.nextLong(1024), rnd.nextLong(1024))) ++
      Seq((0L, 0L), (1023L, 1023L), (0L, 1023L), (1023L, 0L), (1L, 0L), (0L, 1L))
    val bad = cases.toDF("x", "y")
      .withColumn("z_expr", ZOrderExpr.zorder2($"x", $"y"))
      .withColumn("z_hof", expr(
        """aggregate(sequence(0, 9), 0L, (acc, i) ->
           acc + shiftleft(shiftright(x, i) & 1L, 2*i)
               + shiftleft(shiftright(y, i) & 1L, 2*i + 1))"""))
      .filter($"z_expr" =!= $"z_hof").count()
    assert(bad == 0, s"$bad inputs diverged between native and HOF interleave")
  }

  test("zorder2 is monotone-boxed: known Morton values") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L), (3L, 3L))
      .toDF("x", "y")
      .select(ZOrderExpr.zorder2($"x", $"y").as("z")).as[Long].collect()
    // z = x bits on even positions, y bits on odd: (1,0)->1 (0,1)->2
    // (1,1)->3 (2,0)->4 (3,3)->15
    assert(rows.toSeq == Seq(0L, 1L, 2L, 3L, 4L, 15L))
  }

  test("zorder2 runs inside whole-stage codegen (no fallback)") {
    // a parquet-backed plan: a local relation would be constant-folded
    // before reaching codegen
    val df = graft.sources.Tables.orders(spark, sf)
      .select(ZOrderExpr.zorder2(
        $"o_orderkey".bitwiseAND(lit(1023L)),
        $"o_custkey".bitwiseAND(lit(1023L))).as("z"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project") &&
      p.contains("zorderinterleaveexpr"), s"not codegen'd:\n$p")
    assert(df.count() > 0)
    // and the known Morton value survives the codegen path too
    assert(Seq((5L, 9L)).toDF("x", "y")
      .select(ZOrderExpr.zorder2($"x", $"y")).as[Long].head() ==
      // spread(5)=0b10001, spread(9)=0b1000001 shifted left 1
      (java.lang.Long.parseLong("10001", 2) |
        (java.lang.Long.parseLong("1000001", 2) << 1)))
  }
}
