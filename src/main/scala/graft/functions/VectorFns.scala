package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding-vector primitives over `ARRAY<FLOAT>` columns (SURVEY.md
  * §2.11 similarity search). Pure higher-order-function expressions —
  * no UDFs — evaluated inside codegen.
  *
  * Two arithmetic modes:
  *  - `dot`/`cosine`: double arithmetic, the performance path.
  *  - `dotExact`: decimal(18,9) arithmetic — order-independent and
  *    bit-reproducible across engines/partitionings, used for the
  *    oracle-verified queries (IEEE double summation is order-sensitive,
  *    so a double dot product can never be hash-compared cross-engine).
  */
object VectorFns {

  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Double-precision dot product (left-to-right fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _), lit(0.0), _ + _)

  /** Exact decimal dot product — reproducible at any parallelism.
    * Floats are cast via their string form: both Spark and DuckDB print a
    * float as its shortest round-trip decimal, so string→decimal yields
    * bit-identical decimals in both engines, whereas a direct float→decimal
    * cast expands the binary value and diverges at the 1e-8 level. */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        x.cast("string").cast(DecimalType(18, 9)) *
          y.cast("string").cast(DecimalType(18, 9))),
      lit(0).cast(DecimalType(38, 18)),
      // re-cast each partial sum: Spark widens (38,18)+(37,18) to (38,17),
      // which would no longer match the accumulator's declared type
      (acc, x) => (acc + x).cast(DecimalType(38, 18)))
      // Round to scale 12 before the double cast: a scale-18 decimal's
      // integer mantissa exceeds 2^53, and DuckDB's int128→double→/10^18
      // conversion double-rounds (1 ULP off Spark's correctly-rounded
      // BigDecimal path). At scale 12 the mantissa fits in 2^53, so both
      // engines' conversions are exact-then-identical.
      .cast(DecimalType(18, 12))
      .cast("double")

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** L2 (Euclidean) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _))

  /** Random-hyperplane LSH bucket for cosine similarity: `bits` sign bits
    * of projections onto pseudo-random planes. Planes are derived
    * deterministically per (bit, dim) from splitmix64 at PLAN BUILD time and
    * embedded as array literals — they are row-independent, so computing
    * them per row with hash expressions would be pure recompute overhead.
    * Vectors in the same bucket are near-duplicate candidates. */
  def cosineLshBucket(v: Column, bits: Int, dims: Int = 64): Column = {
    val bitCols = (0 until bits).map { b =>
      val planes = Array.tabulate(dims) { i =>
        (java.lang.Long.remainderUnsigned(splitmix64(b * 1000003L + i),
          1000000L).toDouble / 1000000.0) - 0.5
      }
      val proj = aggregate(
        zip_with(asDouble(v), typedlit(planes.toSeq), (x, p) => x * p),
        lit(0.0), _ + _)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** SplitMix64 — deterministic, dependency-free PRNG step. */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
