package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static 61-bit Rabin-Karp kernel shared by interpreted eval, generated
  * code, and the simhash word-vote UDF: h ← h·257 + c (mod 2⁶¹−1) over
  * UTF-16 code units. The modulus is Mersenne, so the 128-bit product
  * reduces with shifts: 2⁶¹ ≡ 1 (mod M). The DuckDB oracles reproduce the
  * recurrence with HUGEINT modular arithmetic.
  */
object HashKernel {
  final val Mod: Long = (1L << 61) - 1
  final val Base: Long = 257L

  def rolling61(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      // h·BASE mod 2⁶¹−1 via the full 128-bit product: h < 2⁶¹ and
      // BASE = 257 keep hi < 2⁵, so every intermediate stays below 2⁶³.
      val lo = h * Base
      val hi = Math.multiplyHigh(h, Base)
      var m = (lo & Mod) + ((hi << 3) | (lo >>> 61))
      if (m >= Mod) m -= Mod
      h = m + s.charAt(i).toLong
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }

  def rolling61(u: UTF8String): Long = rolling61(u.toString)
}

/** `rolling_hash61(text)` as a native codegen'd expression — replaces the
  * scalar-UDF form, which paid a per-row serialization round-trip on the
  * fingerprint and hash-sample paths (the same treatment as
  * [[WordShingles]]).
  */
case class RollingHash61(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash61"

  override def nullSafeEval(input: Any): Any =
    HashKernel.rolling61(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernel.rolling61($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExpressions {
  def rollingHash61(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      RollingHash61(org.apache.spark.sql.graft.ColumnBridge.expression(text)))
}
