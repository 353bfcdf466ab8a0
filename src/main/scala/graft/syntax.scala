package graft

import org.apache.spark.sql.{Column, DataFrame}

/** DataFrame syntax for graft's whole-operator plans — the ONE user
  * surface for each operator family, so callers declare semantics and
  * the engine selects the physical path. `import graft.syntax._`.
  */
object syntax {

  implicit class GraftDataFrameOps(private val left: DataFrame)
      extends AnyVal {

    /** Keyed backward as-of join: for each left row, append the most
      * recent right row (by `rightTs`, per key) at or before the left
      * row's `leftTs`. THE as-of surface — plans
      * [[graft.plans.AsofJoinNode]], whose strategy picks the physical
      * path stats-driven exactly like Spark's JoinSelection: a right
      * side under `spark.sql.autoBroadcastJoinThreshold` runs the
      * broadcast index probe (left side never shuffles or sorts),
      * anything larger the co-clustered two-pointer merge. Callers
      * never choose — the same declaration is the dimension-timeline
      * fast path AND the billion-row merge. Supply a unique `rightTie`
      * for deterministic tie-breaks on equal right timestamps; rename
      * clashing right columns first (the output carries both schemas);
      * `joinType` is "left_outer" (default) or "inner". */
    def asofJoin(right: DataFrame,
        leftKeys: Seq[String], rightKeys: Seq[String],
        leftTs: String, rightTs: String,
        rightTie: Seq[Column] = Nil,
        joinType: String = "left_outer"): DataFrame =
      graft.plans.AsofJoin(left, right, leftKeys, rightKeys,
        leftTs, rightTs, rightTie, joinType)

    /** Point-in-interval band join on `lo <= x < hi` with no equi key,
      * as a bin equijoin (never a nested loop) — the explicit form of
      * what [[graft.plans.BandJoinRewrite]] does to the naive join
      * when it can derive a width. All three columns LongType. */
    def bandJoin(intervals: DataFrame, xCol: String,
        loCol: String, hiCol: String, binWidth: Long): DataFrame =
      graft.operators.IntervalJoin.pointInInterval(
        left, xCol, intervals, loCol, hiCol, binWidth)
  }
}
