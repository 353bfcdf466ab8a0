package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.v2.EventSource

class EventSourceSpec extends SparkSpecBase {

  private def events(n: Long, chunk: Long = 100L): DataFrame =
    spark.read.format("graftevents")
      .option("events", n).option("chunk", chunk).load()

  test("rows match the deterministic formulas (full schema)") {
    val rows = events(50).orderBy("event_id").collect()
    assert(rows.length == 50)
    rows.zipWithIndex.foreach { case (r, i) =>
      val id = i.toLong
      assert(r.getLong(0) == id)
      assert(r.getAs[Timestamp]("ts").getTime ==
        EventSource.tsMicros(id) / 1000)
      assert(r.getAs[Long]("user_id") == EventSource.userId(id))
      assert(r.getAs[String]("event_type") == EventSource.eventType(id))
      assert(r.getAs[String]("payload") == EventSource.payload(id))
    }
  }

  test("event_id range filters prune planned partitions at the source") {
    val full = events(1000, chunk = 100)
    assert(full.rdd.getNumPartitions == 10)
    val sliced = events(1000, chunk = 100)
      .filter(col("event_id") >= 850L && col("event_id") < 960L)
    // chunks [800,900) and [900,1000) intersect [850,960) → 2 partitions
    assert(sliced.rdd.getNumPartitions == 2,
      s"expected 2 pruned partitions, got ${sliced.rdd.getNumPartitions}")
    assert(sliced.count() == 110)
    assert(sliced.agg(min("event_id"), max("event_id")).head() ==
      org.apache.spark.sql.Row(850L, 959L))
    // the pushed range is visible in the scan description
    val p = sliced.queryExecution.executedPlan.toString
    assert(p.contains("graftevents range=[850,960)"), s"pushdown missing:\n$p")
  }

  test("non-pushable predicates still apply as residual filters") {
    val r = events(300)
      .filter(col("event_id") < 30L && col("event_type") === "view")
      .collect()
    // ids 0,3,6,... are 'view' (id % 3 == 0)
    assert(r.map(_.getLong(0)).sorted.toSeq == (0L until 30L by 3).toSeq)
  }

  test("column pruning reaches the reader (scan emits only required cols)") {
    val df = events(100).select("event_id", "user_id")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("cols=event_id,user_id"),
      s"reader not pruned to the projection:\n$p")
    assert(df.columns.toSeq == Seq("event_id", "user_id"))
    assert(df.count() == 100)
  }

  test("the source composes with ordinary relational plans") {
    // per-type counts over a pushed slice — the S1 envelope feeding the
    // usual aggregation spine
    val agg = events(3000)
      .filter(col("event_id") >= 600L)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg.values.sum == 2400L)
    assert(agg("view") == 800L && agg("click") == 800L && agg("purchase") == 800L)
  }
}
