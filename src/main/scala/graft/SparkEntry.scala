package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.functions.{EmailFns => E}
import graft.operators.{Analytic, EventOps, ExportOps, GraphAlgos, GraphOps, Hnsw, RankArtifact, Ingest, IntervalJoin, LangModelOps, Multimodal, PipelineOps, Quality, Relational, Retrieval, SketchOps, Temporal, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2), one entry per
  * operator family; `oracleSql` carries the DuckDB-equivalent SQL for every
  * SQL-expressible query. Streaming semantics (§2.9) are covered by
  * `graft.streaming` + ScalaTest, not oracle-able by design.
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.2): the reference's core question —
    * "extract the OTP and routing key from fresh inbound messages, exactly
    * once" — as one batch pipeline over the `events` stand-in stream:
    * freshness window (F4, pinned to max(ts) for determinism) → OTP
    * extraction from the JSON payload (E3/E11) → key derivation (E14/E15)
    * → latest-per-key (T1). Reference: api/main.py:89-136,269-307. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
    val maxTs = ev.agg(max(col("ts")).as("max_ts"))
    val w = Window.partitionBy(col("login_key"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.join(broadcast(maxTs))
      .filter(E.isFresh(col("ts"), col("max_ts"), "INTERVAL 7 DAYS"))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("msg", concat(lit("Your otp code is "),
        lpad(col("k").cast("string"), 4, "0")))
      .withColumn("otp", E.otp(col("msg")))
      .filter(col("otp").isNotNull)
      .withColumn("username", E.localPart(
        concat(lit("user"), col("user_id").cast("string"), lit("@example.com"))))
      .withColumn("login_key", E.loginKey(lit("zepto"), col("username")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("login_key"), col("otp"), col("ts"), col("event_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Ingest.queries ++ TextOps.queries ++
      VectorOps.queries ++ Multimodal.queries ++ PipelineOps.queries ++
      SketchOps.queries ++ Analytic.queries ++ EventOps.queries ++
      Quality.queries ++ Temporal.queries ++ LangModelOps.queries ++
      IntervalJoin.queries ++ Retrieval.queries ++ ExportOps.queries ++
      GraphOps.queries ++ GraphAlgos.queries ++ RankArtifact.queries ++
      graft.plans.AsofSql.queries ++ Hnsw.queries ++
      graft.plans.KnnSql.queries ++ graft.plans.HnswSql.queries

  /** DuckDB-equivalent SQL for every SQL-expressible query above. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Ingest.oracle ++ TextOps.oracle ++
      VectorOps.oracle ++ Multimodal.oracle ++ PipelineOps.oracle ++
      SketchOps.oracle ++ Analytic.oracle ++ EventOps.oracle ++
      Quality.oracle ++ Temporal.oracle ++ LangModelOps.oracle ++
      IntervalJoin.oracle ++ Retrieval.oracle ++ ExportOps.oracle ++
      GraphOps.oracle ++ GraphAlgos.oracle ++ RankArtifact.oracle ++
      graft.plans.AsofSql.oracle ++ Hnsw.oracle ++
      graft.plans.KnnSql.oracle ++ graft.plans.HnswSql.oracle
}
