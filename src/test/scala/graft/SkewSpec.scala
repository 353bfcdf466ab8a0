package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Tables

class SkewSpec extends SparkSpecBase {

  test("salted join produces exactly the plain join's result set") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    val salted = Skew.saltedJoin(li, o, "l_orderkey", "o_orderkey", 8).count()
    assert(salted == plain)
  }
}
