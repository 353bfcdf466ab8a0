package graft.plans

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.internal.SQLConf

/** Shared name→attribute binding for the plans-package entry points
  * (TopKPerKey, AsofJoin): honors `spark.sql.caseSensitive` via the
  * session resolver — the same contract as `df.select(name)` — so the
  * operators stay drop-in replacements for their composed forms. */
private[plans] object Resolve {
  def attr(p: LogicalPlan, name: String, what: String): Attribute = {
    val resolver = SQLConf.get.resolver
    p.output.find(a => resolver(a.name, name)).getOrElse(
      throw new IllegalArgumentException(
        s"$what column '$name' not in ${p.output.map(_.name).mkString(", ")}"))
  }

  /** Bind a Column-derived expression's unresolved attributes against
    * one side's output so the node is born resolved. */
  def bind(e: Expression, p: LogicalPlan, what: String): Expression =
    e.transformUp {
      case u: UnresolvedAttribute => attr(p, u.name, what)
    }
}
