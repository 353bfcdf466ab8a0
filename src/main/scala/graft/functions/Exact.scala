package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic ("exact") aggregation helpers.
  *
  * Summing IEEE doubles is order-dependent, and Spark's partial/final
  * aggregation order differs run-to-run and engine-to-engine — so a plain
  * `sum(double)` can never hash-match a DuckDB oracle at scale. The fix:
  * round inputs to a fixed decimal scale, aggregate in exact DECIMAL
  * arithmetic (associative, order-independent), and cast the final value to
  * DOUBLE. Both engines then produce bit-identical results regardless of
  * partitioning — which is also the property you want on a 1000-executor
  * cluster (reproducible aggregates under AQE / speculative execution).
  *
  * Cost: decimal aggregation is marginally slower than double, but stays
  * inside whole-stage codegen and map-side partial aggregation.
  */
object Exact {
  def dec(c: Column, scale: Int = 4): Column = c.cast(DecimalType(18, scale))

  /** Order-independent sum of a double column, returned as DOUBLE. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(dec(c, scale)).cast(DoubleType)

  /** Order-independent sum of a product of two double columns. */
  def dsumProd(a: Column, b: Column, scale: Int = 4): Column =
    sum(dec(a, scale) * dec(b, scale)).cast(DoubleType)

  /** Order-independent average (exact decimal sum / count). */
  def davg(c: Column, scale: Int = 4): Column =
    sum(dec(c, scale)).cast(DoubleType) / count(c)

  /** Matching SQL fragments for the DuckDB oracle. */
  def sqlDsum(col: String, scale: Int = 4): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,$scale))) AS DOUBLE)"
  def sqlDsumProd(a: String, b: String, scale: Int = 4): String =
    s"CAST(sum(CAST($a AS DECIMAL(18,$scale)) * CAST($b AS DECIMAL(18,$scale))) AS DOUBLE)"
  def sqlDavg(col: String, scale: Int = 4): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,$scale))) AS DOUBLE) / count($col)"
}
