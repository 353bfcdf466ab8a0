package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Elementwise sum of an `ARRAY<BIGINT>` column as a typed [[Aggregator]] —
  * the exact-arithmetic companion to [[ArrayAvgAgg]], used to train the IVF
  * quantizer (q42): centroids are carried as integer (sum[dims], implied
  * count) pairs so the training is order-independent and bit-reproducible
  * in DuckDB, where a double mean would wobble in its last bits with
  * partition order and could flip a cell assignment at an argmin near-tie.
  *
  * Same shuffle shape as ArrayAvgAgg: one buffer per key per partition,
  * map-side combined — never a posexplode row blowup. Long overflow is out
  * of reach: coordinates are scaled to |x| ≤ ~6e8 (DECIMAL(18,9)·1e9 of a
  * unit-range float), so 2^63 allows ~1.5e10 rows per cell per dimension.
  */
object ArrayLongSumAgg {

  final case class Buf(sums: Array[Long], n: Long)

  def arrayLongSum(dims: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new Aggregator[Seq[Long], Buf, Seq[Long]] {
      override def zero: Buf = Buf(new Array[Long](dims), 0L)
      override def reduce(b: Buf, v: Seq[Long]): Buf = {
        var i = 0
        while (i < dims && i < v.length) { b.sums(i) += v(i); i += 1 }
        Buf(b.sums, b.n + 1)
      }
      override def merge(x: Buf, y: Buf): Buf = {
        var i = 0
        while (i < dims) { x.sums(i) += y.sums(i); i += 1 }
        Buf(x.sums, x.n + y.n)
      }
      override def finish(b: Buf): Seq[Long] = b.sums.toSeq
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    })
}
