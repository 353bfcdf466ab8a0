package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Elementwise mean of an `ARRAY<FLOAT>` column as a typed [[Aggregator]]
  * (registered via `functions.udaf`) — the map-side-combining way to build
  * IVF centroids.
  *
  * The alternative (posexplode to (pos, x) rows, then groupBy) multiplies
  * the row count by the dimensionality BEFORE the shuffle — 64× the shuffle
  * rows at dims=64, which is exactly the cost that matters at corpus scale.
  * This Aggregator keeps one (sum[dims], count) buffer per key per
  * partition: partial aggregation happens map-side and the shuffle carries
  * one buffer per (partition, key).
  *
  * Double summation is partition-order dependent (~1e-15 noise); consumers
  * must treat means as rank-only comparable, same as every double agg. */
object ArrayAvgAgg {

  final case class Buf(sums: Array[Double], n: Long)

  def arrayAvg(dims: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new Aggregator[Seq[Float], Buf, Seq[Double]] {
      override def zero: Buf = Buf(new Array[Double](dims), 0L)
      override def reduce(b: Buf, v: Seq[Float]): Buf = {
        var i = 0
        while (i < dims && i < v.length) { b.sums(i) += v(i); i += 1 }
        Buf(b.sums, b.n + 1)
      }
      override def merge(x: Buf, y: Buf): Buf = {
        var i = 0
        while (i < dims) { x.sums(i) += y.sums(i); i += 1 }
        Buf(x.sums, x.n + y.n)
      }
      override def finish(b: Buf): Seq[Double] =
        if (b.n == 0) Seq.empty else b.sums.map(_ / b.n).toSeq
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    })
}
