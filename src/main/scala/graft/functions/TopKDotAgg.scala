package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Partial-aggregating top-k by (score desc, id asc) — the k-NN join's
  * per-query rank as a typed [[Aggregator]] instead of a row_number
  * window. The window form shuffles and sorts EVERY candidate pair by
  * qid (68.7M rows at the 64× smoke); this form reduces map-side to one
  * ≤k buffer per query per partition before the exchange — at corpus
  * scale the shuffle carries ~nprobe·N·k values instead of the full
  * candidate set, the [[LatestAgg]] argument applied to ranked
  * retrieval. Ordering is EXACTLY the window's (dot.desc, vec_id):
  * ranks and survivors are bit-identical, ties included — the oracle
  * rows (q105/q110/q113) pin the equivalence.
  */
object TopKDotAgg {

  /** Parallel arrays sorted best-first, capped at k. */
  final case class Buf(dots: Array[Double], ids: Array[Long])

  def topKByDot(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new Aggregator[(Double, Long), Buf, Seq[(Double, Long)]] {
      // "a ranks strictly before b" under (dot desc, vec_id asc)
      private def before(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
        d1 > d2 || (d1 == d2 && i1 < i2)
      override def zero: Buf = Buf(Array.empty, Array.empty)
      override def reduce(b: Buf, x: (Double, Long)): Buf =
        insert(b, x._1, x._2)
      override def merge(a: Buf, b: Buf): Buf = {
        var r = a
        var i = 0
        while (i < b.ids.length) { r = insert(r, b.dots(i), b.ids(i)); i += 1 }
        r
      }
      private def insert(b: Buf, d: Double, id: Long): Buf = {
        val n = b.ids.length
        if (n == k && !before(d, id, b.dots(n - 1), b.ids(n - 1))) return b
        var pos = 0
        while (pos < n && before(b.dots(pos), b.ids(pos), d, id)) pos += 1
        val m = math.min(n + 1, k)
        val nd = new Array[Double](m)
        val ni = new Array[Long](m)
        System.arraycopy(b.dots, 0, nd, 0, pos)
        System.arraycopy(b.ids, 0, ni, 0, pos)
        nd(pos) = d
        ni(pos) = id
        val tail = m - pos - 1
        if (tail > 0) {
          System.arraycopy(b.dots, pos, nd, pos + 1, tail)
          System.arraycopy(b.ids, pos, ni, pos + 1, tail)
        }
        Buf(nd, ni)
      }
      override def finish(b: Buf): Seq[(Double, Long)] =
        b.dots.indices.map(i => (b.dots(i), b.ids(i)))
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[(Double, Long)]] =
        ExpressionEncoder[Seq[(Double, Long)]]()
    })
}
