package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Design notes (100 TB posture):
  *  - Plain `spark.read.parquet` keeps the scan declarative so Catalyst can
  *    push filters / prune columns into the vectorized parquet reader; never
  *    materialize or cache here.
  *  - `events.ts` has shipped under two encodings across driver testdata
  *    regenerations, so the loader is TYPE-ADAPTIVE on the read schema
  *    rather than assuming one: parquet TIMESTAMP(NANOS) (read as BIGINT
  *    under `spark.sql.legacy.parquet.nanosAsLong`, truncated to micros
  *    with integer `div` — matching DuckDB's TIMESTAMP_NS → TIMESTAMP
  *    cast), or TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
  *    TIMESTAMP_NTZ, cast to TIMESTAMP — the session tz is UTC, so values
  *    match DuckDB's naive read). Either way the engine-facing schema is
  *    always `ts: TIMESTAMP`. Any other encoding fails LOUDLY in one
  *    labelled place here, not in 100 downstream artifacts.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventsTs(spark.read.parquet(s"$sfDir/events.parquet"))
    case n =>
      spark.read.parquet(s"$sfDir/$n.parquet")
  }

  /** Normalize `events.ts` to `TIMESTAMP` whatever encoding the driver's
    * testdata generator used (see object Scaladoc). Works on batch AND
    * streaming DataFrames — the match is on the analyzed schema only. */
  def normalizeEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType => // legacy TIMESTAMP(NANOS) data read as BIGINT
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // TIMESTAMP(MICROS, isAdjustedToUTC=false)
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType =>
        raw
      case other =>
        throw new IllegalStateException(
          s"events.ts schema drift: expected BIGINT (legacy nanos), " +
          s"TIMESTAMP_NTZ (micros) or TIMESTAMP, got $other — the driver " +
          s"testdata encoding changed; teach Tables.normalizeEventsTs the " +
          s"new type.")
    }
  }

  /** Widen a scan to the session's default parallelism when the source read
    * produced fewer partitions — the testdata tables are single small
    * parquet files, so a CPU-heavy map stage (MinHash, SimHash, MIME parse,
    * decimal dot products) placed directly on the scan would run on ONE of
    * 32 cores. Conditional on the actual scan width: at cluster scale the
    * input is already thousands of splits and this is a no-op (no shuffle),
    * which is exactly the property an unconditional repartition would lose.
    * The shuffle it does locally moves only the narrow pre-compute rows. */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Register every table as a temp view so the engine's full surface is
    * reachable from `spark.sql(...)` as well as the DataFrame API. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
