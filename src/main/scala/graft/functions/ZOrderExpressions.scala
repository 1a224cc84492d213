package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Static kernel shared by interpreted eval and generated code. */
object ZOrderKernel {
  /** Morton z-value: interleave the low 31 bits of x (even positions)
    * and y (odd positions) into one non-negative long. Rows close in
    * BOTH dimensions land close on the z-curve, so range-partitioning +
    * sorting by z-value clusters multi-dimensional locality into few
    * files — min/max file statistics then prune 2-D predicates the way
    * a single-column sort never can.
    */
  def interleave(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** Codegen'd 2-D Morton z-value of two integral columns (negative inputs
  * are the caller's contract to avoid — dimension values are expected to
  * be keys/bucketed ordinates).
  */
case class ZValue2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "z_value2"

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKernel.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderKernel.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderExpressions {
  /** z-value of two long columns (cast integrals to long first) */
  def zValue(x: Column, y: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ZValue2(
        org.apache.spark.sql.graft.ColumnBridge.expression(x),
        org.apache.spark.sql.graft.ColumnBridge.expression(y)))
}
