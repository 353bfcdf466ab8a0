package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, AttributeSet, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, ClusteredDistribution, Distribution,
  IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Keyed backward as-of join as a WHOLE-OPERATOR plan — the canonical
  * tier-(c) case (SURVEY §7.4): Spark has NO native as-of join, so
  * every composition pays somewhere. The union+window form (q29) must
  * squeeze both sides into ONE schema — every shuffled row is
  * null-padded to |L|+|R| columns — and replays a last(ignoreNulls)
  * window per fetched right column; the range-join form explodes
  * candidates quadratically per key. This plan is the pandas
  * merge_asof / kdb aj shape, distributed: both sides hash-cluster by
  * key (co-partitioned by EnsureRequirements, each side keeping its
  * OWN narrow schema on the wire), each partition locally sorts by
  * (key, ts), and a single forward two-pointer merge emits, for every
  * left row, the LAST right row with r.ts <= l.ts per key — O(|L|+|R|)
  * per partition, no window state, no candidate explosion, and the
  * right pointer never rewinds. Join semantics are SQL-standard: a
  * null key or null ts never matches ("inner" drops such left rows,
  * "left_outer" null-extends them).
  *
  * Ties on equal right ts resolve by the trailing `rightTie` sort
  * columns (last wins = greatest tie) — supply a unique tie-break for
  * deterministic output, the same contract the window form needs. */
case class AsofJoinNode(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Seq[SortOrder],
    isOuter: Boolean,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching, non-empty key lists")
  override def output: Seq[Attribute] =
    if (isOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsofJoinNode = copy(left = l, right = r)
}

case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Seq[SortOrder],
    isOuter: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (isOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  // co-partition both sides on the join keys; EnsureRequirements makes
  // the two exchanges compatible exactly as it does for a shuffled join
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    (rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))
      ++ rightTie)

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  override def outputPartitioning = left.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTs = leftTs
    val rTs = rightTs
    val outer = isOuter
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTs), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTs), rOut)
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val tsOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(Seq(lTs.dataType))
      // bind against the OUTER-adjusted right schema: with the child's
      // non-nullable attrs the projection would skip null checks and
      // read garbage (0, "") from the null-extension row
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ (if (outer) rOut.map(_.withNullability(true)) else rOut))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // the right cursor: current un-consumed row (reused buffer) and
        // its projected key/ts; `matched*` hold the COPIED best match
        // for the key the merge is currently inside
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTsRow: InternalRow = _
        private def advanceRight(): Unit = {
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKey = rKeyProj(rRow)
            rTsRow = rTsProj(rRow)
          } else { rRow = null; rKey = null; rTsRow = null }
        }
        advanceRight()
        private var matchedKey: InternalRow = _
        private var matchedRow: InternalRow = _
        private var nextOut: InternalRow = _

        private def findFor(lRow: InternalRow): InternalRow = {
          val lKey = lKeyProj(lRow)
          if (lKey.anyNull) return null // SQL equi-key semantics
          val lTsR = lTsProj(lRow)
          if (lTsR.anyNull) return null // nothing is <= null
          if (matchedKey != null && keyOrd.compare(matchedKey, lKey) != 0) {
            matchedKey = null; matchedRow = null
          }
          // advance the right cursor while it still qualifies for this
          // left row: smaller key, or same key with ts <= left ts (null
          // right key/ts rows sort first and are skipped, never saved)
          var advancing = true
          while (advancing && rRow != null) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) advanceRight()
            else if (c > 0) advancing = false
            else if (rKey.anyNull) advanceRight()
            else if (rTsRow.anyNull) advanceRight()
            else if (tsOrd.compare(rTsRow, lTsR) <= 0) {
              // later qualifying rows overwrite: sorted (ts, tie) order
              // makes "last wins" = greatest (ts, tie)
              matchedKey = rKey.copy()
              matchedRow = rRow.copy()
              advanceRight()
            } else advancing = false
          }
          if (matchedKey != null && keyOrd.compare(matchedKey, lKey) == 0)
            matchedRow
          else null
        }

        private def computeNext(): Unit = {
          nextOut = null
          while (nextOut == null && lIter.hasNext) {
            val lRow = lIter.next()
            val m = findFor(lRow)
            if (m != null) nextOut = outProj(joined(lRow, m))
            else if (outer) nextOut = outProj(joined(lRow, nullRight))
          }
        }

        override def hasNext: Boolean = {
          if (nextOut == null) computeNext()
          nextOut != null
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = nextOut
          nextOut = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsofJoinExec = copy(left = l, right = r)
}

/** Broadcast variant — the 100 TB fast path when the right side is a
  * small dimension timeline (rates, configs, slowly-changing state):
  * the LEFT side never shuffles OR sorts. The broadcast right is
  * indexed once per task into key → time-sorted array, and each left
  * row binary-searches the last entry at or before its ts. Same
  * output contract and null semantics as [[AsofJoinExec]]; selection
  * between the two is stats-driven in [[AsofJoinStrategy]], so
  * `spark.sql.autoBroadcastJoinThreshold` (and the broadcast-off
  * hostile sweep) governs it exactly like Spark's own JoinSelection. */
case class BroadcastAsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Seq[SortOrder],
    isOuter: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (isOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // the left side flows through untouched — no exchange, no sort
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeys = leftKeys
    val rKeysB = rightKeys
    val lTs = leftTs
    val rTs = rightTs
    val tie = rightTie
    val outer = isOuter
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions({ lIter =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTs), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTs), rOut)
      val tsOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(Seq(lTs.dataType))
      val timeOrd = RowOrdering.create(
        SortOrder(rTs, Ascending) +: tie, rOut)
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ (if (outer) rOut.map(_.withNullability(true)) else rOut))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      // task-local index over the broadcast rows: key → rows sorted by
      // (ts, tie). The broadcast array's rows are already materialized
      // and immutable, so the index stores REFERENCES into it — only
      // the map keys and the per-row ts probes (single-field rows for
      // allocation-free binary-search compares) are copied; duplicating
      // whole rows per task would multiply the right side by the task
      // count. Null-key/null-ts rows can never match — dropped at build.
      val index = new java.util.HashMap[InternalRow, Array[(InternalRow, InternalRow)]]
      locally {
        val groups = new java.util.HashMap[InternalRow,
          scala.collection.mutable.ArrayBuffer[InternalRow]]
        bcast.value.foreach { row =>
          val k = rKeyProj(row)
          if (!k.anyNull && !rTsProj(row).anyNull) {
            var buf = groups.get(k)
            if (buf == null) {
              buf = new scala.collection.mutable.ArrayBuffer[InternalRow]
              groups.put(k.copy(), buf)
            }
            buf += row
          }
        }
        groups.forEach { (k, buf) =>
          val sorted = buf.sortWith((a, b) => timeOrd.compare(a, b) < 0)
          index.put(k, sorted.map(r => (r, rTsProj(r).copy())).toArray)
        }
      }
      lIter.flatMap { lRow =>
        val lKey = lKeyProj(lRow)
        var m: InternalRow = null
        if (!lKey.anyNull) {
          val lTsR = lTsProj(lRow)
          if (!lTsR.anyNull) {
            val arr = index.get(lKey)
            if (arr != null) {
              // last entry with ts <= left ts
              var lo = 0
              var hi = arr.length - 1
              var best = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (tsOrd.compare(arr(mid)._2, lTsR) <= 0) { best = mid; lo = mid + 1 }
                else hi = mid - 1
              }
              if (best >= 0) m = arr(best)._1
            }
          }
        }
        if (m != null) Iterator.single(outProj(joined(lRow, m)))
        else if (outer) Iterator.single(outProj(joined(lRow, nullRight)))
        else Iterator.empty
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): BroadcastAsofJoinExec =
    copy(left = l, right = r)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(lk, rk, lts, rts, tie, outer, l, r) =>
      // stats-driven selection, the JoinSelection discipline: a right
      // side under the broadcast threshold skips the left's exchange
      // and sort entirely; -1 (the broadcast-off sweep) forces the
      // shuffled merge
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      if (threshold > 0 && r.stats.sizeInBytes <= threshold)
        BroadcastAsofJoinExec(lk, rk, lts, rts, tie, outer,
          planLater(l), planLater(r)) :: Nil
      else
        AsofJoinExec(lk, rk, lts, rts, tie, outer,
          planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** DataFrame entry: for each left row, append the most recent right
  * row (by `rightTsCol`, per key) at or before the left row's
  * `leftTsCol`. `joinType` is "inner" or "left_outer". Rename clashing
  * right columns BEFORE joining — the output carries both schemas. */
object AsofJoin {

  private[graft] def parseJoinType(joinType: String): Boolean =
    joinType match {
      case "left_outer" => true
      case "inner" => false
      case t => throw new IllegalArgumentException(
        s"as-of join supports inner | left_outer, got $t")
    }

  /** Build a born-resolved [[AsofJoinNode]] from ANALYZED children —
    * the shared core of the DataFrame surface ([[apply]]) and the SQL
    * TVF ([[ResolveAsofTvf]]); both get the same self-join dedup, name
    * binding, loud type checks, and float-key normalization. `tieExprs`
    * may carry unresolved attributes — they bind against the (deduped)
    * right side here. */
  private[graft] def node(l: LogicalPlan, r0: LogicalPlan,
      leftKeyCols: Seq[String], rightKeyCols: Seq[String],
      leftTsCol: String, rightTsCol: String,
      tieExprs: Seq[Expression], isOuter: Boolean): AsofJoinNode = {
    // self-join safety: if the two sides share ANY exprIds (e.g. both
    // derive from one parent DataFrame), the output projection — which
    // binds by exprId — would silently resolve both sides' columns to
    // the same ordinals and emit corrupted rows. Re-alias the whole
    // right side to fresh exprIds, the Dataset.join dedupRight move.
    val r: LogicalPlan =
      if (l.outputSet.intersect(r0.outputSet).isEmpty) r0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        r0.output.map(a => Alias(a, a.name)()), r0)
    val tie = tieExprs.map {
      case so: SortOrder =>
        so.copy(child = Resolve.bind(so.child, r, "as-of tie"))
      case e => SortOrder(Resolve.bind(e, r, "as-of tie"), Ascending)
    }
    val lKeys = leftKeyCols.map(Resolve.attr(l, _, "as-of left key"))
    val rKeys = rightKeyCols.map(Resolve.attr(r, _, "as-of right key"))
    val lTs = Resolve.attr(l, leftTsCol, "as-of left ts")
    val rTs = Resolve.attr(r, rightTsCol, "as-of right ts")
    // fail type drift loudly: the merge orderings and the broadcast
    // index both read RIGHT rows through LEFT-typed comparators — a
    // silent Int-vs-Long or Timestamp-vs-Long mismatch would
    // mis-compare, not error. (Spark's analyzer inserts casts for
    // built-in joins; this node is born resolved, so no coercion runs.)
    lKeys.zip(rKeys).zipWithIndex.foreach { case ((a, b), i) =>
      require(a.dataType == b.dataType,
        s"as-of key $i type mismatch: ${a.dataType} vs ${b.dataType} — cast one side first")
    }
    require(lTs.dataType == rTs.dataType,
      s"as-of ts type mismatch: ${lTs.dataType} vs ${rTs.dataType} — cast one side first")
    // normalize float/double keys so the hash distribution, the merge
    // ordering, and the broadcast index's byte-equality HashMap all
    // agree on -0.0/NaN (see the TopKPerKey note; without this the two
    // physical paths can return DIFFERENT results for the same query)
    AsofJoinNode(
      lKeys.map(GraftSqlShims.normalizeFloats),
      rKeys.map(GraftSqlShims.normalizeFloats), lTs, rTs,
      tie, isOuter, l, r)
  }

  def apply(left: DataFrame, right: DataFrame,
      leftKeyCols: Seq[String], rightKeyCols: Seq[String],
      leftTsCol: String, rightTsCol: String,
      rightTie: Seq[Column] = Nil,
      joinType: String = "left_outer"): DataFrame =
    GraftSqlShims.ofRows(left.sparkSession, node(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      leftKeyCols, rightKeyCols, leftTsCol, rightTsCol,
      rightTie.map(GraftSqlShims.expr), parseJoinType(joinType)))
}
