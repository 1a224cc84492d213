package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for embedding dot products — the hot scalar
  * kernel of the similarity operators. The higher-order-function form
  * (`aggregate(zip_with(...))`) allocates an intermediate array per row
  * pair; this expression generates a single fused loop (option (b) in the
  * custom-operator preference order: a codegen'd `Expression` before a UDF).
  *
  * Accumulation is left-to-right in double, so results are bit-identical to
  * the zip_with fold and to an oracle summing elements in index order.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"DotProduct needs array<float|double>, got $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val af = elemIsFloat(left)
    val bf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val aGet = if (elemIsFloat(left)) s"(double)$a.getFloat($i)" else s"$a.getDouble($i)"
      val bGet = if (elemIsFloat(right)) s"(double)$b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $aGet * $bGet;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression for the PQ asymmetric-distance kernel: the
  * per-pair hot loop of every PQ/IVF-PQ scan. `left` is the row's code
  * array (array<int>, one sub-centroid id per subspace), `right` the
  * query's lookup table (array<array<double>>, per-subspace distances to
  * each sub-centroid). Result = Σ_j lut(j)(codes(j)) — `m` array lookups
  * and adds per pair, fused into the scan's whole-stage codegen instead
  * of a UDF's per-row ser/de round trip. Accumulation is left-to-right
  * in double — bit-identical to the UDF it replaces and to the oracle's
  * l0.dist + l1.dist + ... left-to-right sum.
  */
case class AdcDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _),
            ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"AdcDistance needs (array<int>, array<array<double>>), got $other")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val n = codes.numElements()
    var acc = 0.0
    var j = 0
    while (j < n) {
      acc += lut.getArray(j).getDouble(codes.getInt(j))
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $c.numElements();
         |double $acc = 0.0;
         |for (int $j = 0; $j < $n; $j++) {
         |  $acc += $l.getArray($j).getDouble($c.getInt($j));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** dot product as a Column over array<float>/array<double> columns */
  def dotNative(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      DotProduct(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** PQ asymmetric distance as a Column: codes array<int> against a
    * per-query LUT array<array<double>> */
  def adcNative(codes: Column, lut: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      AdcDistance(
        org.apache.spark.sql.graft.ColumnBridge.expression(codes),
        org.apache.spark.sql.graft.ColumnBridge.expression(lut)))
}
