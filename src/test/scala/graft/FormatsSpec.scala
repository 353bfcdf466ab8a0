package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** File-format round-trips beyond parquet (§2.1: the reference's world is
  * JSON envelopes + text files): JSON and CSV write→read preserve values
  * under an explicit schema (never schema inference in production paths). */
class FormatsSpec extends SparkSpecBase {

  test("JSON sink → schema'd JSON source round-trips the events table") {
    val dir = java.nio.file.Files.createTempDirectory("events_json").toString
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    ev.write.mode("overwrite").json(dir)
    val back = spark.read.schema(ev.schema).json(dir)
    assert(back.count() == ev.count())
    val a = ev.orderBy("event_id").collect().toSeq
    val b = back.orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("CSV round-trip with explicit schema and header") {
    val dir = java.nio.file.Files.createTempDirectory("nation_csv").toString
    val n = Tables.nation(spark, sf)
    n.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(n.schema).option("header", "true").csv(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      n.orderBy("n_nationkey").collect().toSeq)
  }

  test("ORC round-trip (columnar alternative; predicate pushdown preserved)") {
    val dir = java.nio.file.Files.createTempDirectory("lineitem_orc").toString
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"), col("l_shipdate"))
    li.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).filter(col("l_quantity") > 30)
    // pushdown reaches the ORC scan too
    val p = back.queryExecution.toString
    assert(p.contains("PushedFilters") && p.contains("l_quantity"),
      s"expected ORC pushdown:\n$p")
    assert(back.count() == li.filter(col("l_quantity") > 30).count())
  }

  test("PERMISSIVE vs FAILFAST JSON parse modes (§1.3 ingress validation)") {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("historyId BIGINT, emailAddress STRING")
    val good = """{"historyId": 7, "emailAddress": "a@b.com"}"""
    val bad = """{"historyId": "not-a-number and not even json'"""
    val df = Seq(good, bad).toDF("s")
    val permissive = df.select(from_json($"s", schema).as("m")).collect()
    assert(permissive(0).getStruct(0).getLong(0) == 7L)
    assert(permissive(1).getStruct(0) == null ||
      permissive(1).getStruct(0).isNullAt(0)) // malformed → nulls, no failure
  }

  test("events.ts loader is type-adaptive; unknown encodings fail loudly") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // the three accepted encodings all normalize to TIMESTAMP
    val legacyNanos = Seq(1700000000123456789L).toDF("ts")
    assert(Tables.normalizeEventsTs(legacyNanos).schema("ts").dataType ==
      TimestampType)
    val ntz = legacyNanos.select(
      timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType).as("ts"))
    assert(Tables.normalizeEventsTs(ntz).schema("ts").dataType ==
      TimestampType)
    val already = legacyNanos.select(
      timestamp_micros(expr("ts div 1000")).as("ts"))
    assert(Tables.normalizeEventsTs(already).schema("ts").dataType ==
      TimestampType)
    // nanos truncation and NTZ cast agree on the same instant (UTC session)
    val a = Tables.normalizeEventsTs(legacyNanos).head().getTimestamp(0)
    val b = Tables.normalizeEventsTs(ntz).head().getTimestamp(0)
    assert(a == b, s"nanos-shim and NTZ-cast disagree: $a vs $b")
    // any other encoding → one named load-time error, not 27 broken artifacts
    val drifted = Seq("2024-01-01").toDF("ts")
    val ex = intercept[IllegalStateException] {
      Tables.normalizeEventsTs(drifted)
    }
    assert(ex.getMessage.contains("events.ts schema drift"))
  }

  test("real testdata events.ts loads as TIMESTAMP under the current encoding") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(ev.count() > 0)
  }
}
