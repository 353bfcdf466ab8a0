package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSimilarityExpr, ZOrderInterleaveExpr}

/** Session extensions: registers the engine's native Catalyst expressions
  * (SURVEY.md §7.4 tier (b) custom operators) and the whole-operator
  * planner strategy for rank-only top-k per key (tier (c) — see
  * [[graft.plans.TopKPerKeyNode]]). Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // SQL surface for the native as-of join: the graft_asof TVF emits
    // an UnresolvedAsofJoin; the resolution rule rebuilds it through
    // the same core as the DataFrame surface once the relations resolve
    ext.injectTableFunction(graft.plans.AsofSql.tvf)
    ext.injectResolutionRule(_ => graft.plans.ResolveAsofTvf)
    // SQL surface for the ANN family: graft_knn splices the library's
    // IVF kNN-join plan (the q105 path) through the same two-phase TVF
    // resolution discipline
    ext.injectTableFunction(graft.plans.KnnSql.tvf)
    ext.injectResolutionRule(_ => graft.plans.ResolveKnnTvf)
    ext.injectTableFunction(graft.plans.KnnSql.tvfStored)
    ext.injectResolutionRule(_ => graft.plans.ResolveKnnStoredTvf)
    // SQL surface for the written HNSW graph artifact: the same
    // two-phase TVF discipline, routed through Hnsw.searchStored
    ext.injectTableFunction(graft.plans.HnswSql.tvfStored)
    ext.injectResolutionRule(_ => graft.plans.ResolveHnswStoredTvf)
    ext.injectOptimizerRule { session =>
      // the injected copy runs in the operator-optimization fixed point,
      // which is BEFORE RewriteSubquery turns a range-EXISTS into the
      // left-semi join the rule targets — so register a second copy in
      // experimental.extraOptimizations ("User Provided Optimizers",
      // the optimizer's final batch). The rule is idempotent (its own
      // output carries an equi conjunct the matcher rejects), so the
      // double registration costs one extra no-op pass, nothing more.
      // check-then-append on a plain var: synchronize so two threads
      // racing the session's first optimization can't lose the
      // registration (a lost write would silently leave range-EXISTS
      // band joins on the nested-loop plan for the session's lifetime)
      session.experimental.synchronized {
        if (!session.experimental.extraOptimizations
            .contains(graft.plans.BandJoinRewrite))
          session.experimental.extraOptimizations ++=
            Seq(graft.plans.BandJoinRewrite)
      }
      graft.plans.BandJoinRewrite
    }
    ext.injectFunction((
      FunctionIdentifier("cosine_fast"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_fast"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "cosine_fast(a, b) takes exactly 2 arguments")
        CosineSimilarityExpr(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[ZOrderInterleaveExpr].getName, "zorder2"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "zorder2(x, y) takes exactly 2 arguments")
        ZOrderInterleaveExpr(args(0), args(1))
      }))
  }
}
