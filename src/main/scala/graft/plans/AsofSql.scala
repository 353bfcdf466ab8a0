package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedException, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.sources.Tables

/** SQL surface for the native as-of join (round-13 verdict task #7):
  * `graft.syntax.asofJoin` serves DataFrame callers, but SQL users had
  * no way to reach [[AsofJoinNode]]. The entry is a table-valued
  * function registered through `SparkSessionExtensions
  * .injectTableFunction` — the same extension point Spark's own
  * `range()` uses — so it composes with plain SQL:
  *
  * {{{
  *   SELECT * FROM graft_asof(
  *     'purchases', 'clicks',        -- left/right table names
  *     'user_id',   'c_user',       -- comma-separated key lists
  *     'ts',        'click_ts'      -- as-of timestamps
  *     [, 'click_id'                -- optional comma-separated tie
  *     [, 'left_outer' | 'inner']]) -- optional join type
  * }}}
  *
  * Resolution is two-phase, the analyzer's own discipline: the TVF
  * builder can only see argument LITERALS (table names aren't resolved
  * yet), so it emits an [[UnresolvedAsofJoin]] carrying the names with
  * `UnresolvedRelation` children; once the analyzer has resolved those
  * children, [[ResolveAsofTvf]] (an injected resolution rule) rebuilds
  * it through [[AsofJoin.node]] — the SAME binding, self-join dedup,
  * type checks, and float-key normalization as the DataFrame surface,
  * one core for both entries. Physical selection stays stats-driven in
  * [[AsofJoinStrategy]] (broadcast index vs co-clustered merge).
  */
case class UnresolvedAsofJoin(
    leftKeyNames: Seq[String], rightKeyNames: Seq[String],
    leftTsName: String, rightTsName: String,
    tieNames: Seq[String], isOuter: Boolean,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = throw new UnresolvedException("output")
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): UnresolvedAsofJoin =
    copy(left = l, right = r)
}

/** Rewrites [[UnresolvedAsofJoin]] to a born-resolved [[AsofJoinNode]]
  * the moment both relations have resolved — before that the node
  * reports unresolved, so the analyzer keeps iterating instead of
  * accepting a half-bound plan. */
object ResolveAsofTvf extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedAsofJoin if u.childrenResolved =>
        AsofJoin.node(u.left, u.right, u.leftKeyNames, u.rightKeyNames,
          u.leftTsName, u.rightTsName,
          u.tieNames.map(org.apache.spark.sql.catalyst.analysis
            .UnresolvedAttribute.quoted),
          u.isOuter)
    }
}

object AsofSql {

  /** The `graft_asof` table-function description for
    * `SparkSessionExtensions.injectTableFunction`. */
  def tvf: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_asof"),
    new ExpressionInfo(classOf[AsofJoinNode].getName, "graft_asof"),
    (args: Seq[Expression]) => {
      require(args.length >= 6 && args.length <= 8,
        "graft_asof(left, right, leftKeys, rightKeys, leftTs, rightTs" +
          "[, rightTie[, joinType]]) takes 6-8 string arguments, got " +
          args.length)
      def str(i: Int): String = args(i) match {
        case Literal(v, StringType) if v != null => v.toString
        case e => throw new IllegalArgumentException(
          s"graft_asof: argument ${i + 1} must be a string literal, " +
            s"got $e")
      }
      def names(i: Int): Seq[String] =
        str(i).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val (lNames, rNames) = (names(2), names(3))
      require(lNames.nonEmpty && lNames.length == rNames.length,
        "graft_asof: key lists must be non-empty and the same length")
      UnresolvedAsofJoin(
        lNames, rNames, str(4), str(5),
        if (args.length >= 7) names(6) else Nil,
        AsofJoin.parseJoinType(
          if (args.length == 8) str(7) else "left_outer"),
        UnresolvedRelation(str(0).split('.').toSeq),
        UnresolvedRelation(str(1).split('.').toSeq))
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q117's semantics reached from PURE SQL: the TVF plans the same
    // AsofJoinNode as the DataFrame surface (plan-pinned in
    // AsofJoinSpec), so the oracle — DuckDB's LATERAL backward fetch —
    // is the same row law q117 passes.
    "q145_asof_sql" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
          col("event_id").as("click_id"), col("value").as("click_value"))
        .createOrReplaceTempView("graft_asof_clicks")
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
        .createOrReplaceTempView("graft_asof_purchases")
      s.sql("""
        SELECT event_id, user_id, ts, click_id, click_ts, click_value
        FROM graft_asof('graft_asof_purchases', 'graft_asof_clicks',
                        'user_id', 'c_user', 'ts', 'click_ts', 'click_id')
        ORDER BY event_id""")
    }))

  def oracle: Map[String, String] = Map(
    "q145_asof_sql" ->
      """SELECT p.event_id, p.user_id, p.ts,
           c.click_id, c.click_ts, c.click_value
         FROM (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase') p
         LEFT JOIN LATERAL (
           SELECT event_id AS click_id, ts AS click_ts,
             value AS click_value
           FROM events c
           WHERE c.event_type = 'click' AND c.user_id = p.user_id
             AND c.ts <= p.ts
           ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) c ON true
         ORDER BY p.event_id""")
}
