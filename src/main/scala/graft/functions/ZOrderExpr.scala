package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 2-dimensional Z-order (Morton) interleave of
  * the low 16 bits of two LONG columns, with whole-stage-codegen support.
  *
  * Custom-operator tier (b) of the design hierarchy (SURVEY.md §7.4), and
  * the natural upgrade from q96's higher-order-aggregate formulation: the
  * HOF builds a 10-step fold with per-step lambda dispatch, while this
  * emits the classic branch-free magic-mask bit spread (4 shift/mask steps
  * per dimension) in tight generated Java — the form a layout engine would
  * hand-write. Inputs already masked below 2^10 produce values identical
  * to the HOF (their high spread bits are zero), which the equivalence
  * property spec pins.
  */
case class ZOrderInterleaveExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 takes (bigint, bigint), got (${left.dataType}, ${right.dataType})")

  private def spread16(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    spread16(a.asInstanceOf[Long]) | (spread16(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (zx, zy) = (ctx.freshName("zx"), ctx.freshName("zy"))
      def spread(out: String, in: String): String =
        s"""
          long $out = $in & 0xFFFFL;
          $out = ($out | ($out << 8)) & 0x00FF00FFL;
          $out = ($out | ($out << 4)) & 0x0F0F0F0FL;
          $out = ($out | ($out << 2)) & 0x33333333L;
          $out = ($out | ($out << 1)) & 0x55555555L;
        """
      s"""
        ${spread(zx, a)}
        ${spread(zy, b)}
        ${ev.value} = $zx | ($zy << 1);
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderInterleaveExpr =
    copy(left = newLeft, right = newRight)
}

object ZOrderExpr {
  /** Column-API surface; requires [[graft.GraftExtensions]] on the session
    * (same function-registration route as [[CosineExpr.cosineFast]]). */
  def zorder2(x: Column, y: Column): Column =
    org.apache.spark.sql.functions.call_function("zorder2", x, y)
}
