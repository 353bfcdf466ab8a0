package graft

import org.apache.spark.sql.functions._
import graft.functions.LatestAgg
import graft.sources.Tables

class LatestAggSpec extends SparkSpecBase {

  test("typed argmax-latest Aggregator ≡ window-based latest-per-user (q24)") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    // window form (the oracle-checked q24 plan)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val windowed = ev.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // aggregator form: one buffered row per key before the shuffle
    val agged = ev.select($"user_id",
        unix_micros($"ts").as("ts"), $"event_id".as("eventId"),
        $"event_type".as("payload"))
      .as[(Long, Long, Long, String)]
      .map { case (u, t, id, p) => (u, LatestAgg.Event(t, id, p)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(LatestAgg.latest.toColumn)
      .collect().map { case (u, e) => u -> e.eventId }.toMap
    assert(agged == windowed)
  }
}
