package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object ShingleKernel {
  /** Distinct word n-gram shingles of a single-space-tokenized text, in
    * first-occurrence order. Semantics match `string_split(text, ' ')` +
    * contiguous n-windows + `array_to_string(..., ' ')` + distinct — the
    * form the DuckDB oracles use (empty tokens from repeated separators
    * are preserved, like both engines' split).
    */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](m * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** All contiguous word n-grams WITH multiplicity, in position order —
    * the counting form (repetition metrics need per-gram frequencies,
    * which the distinct form above destroys). Same tokenization contract.
    */
  def shinglesAll(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Distinct word n-gram shingles as ONE codegen'd pass per row.
  *
  * Replaces the nested higher-order-function form
  * (`transform(sequence(...), i => concat_ws(slice(split(text), ...)))`):
  * Catalyst evaluates ArrayTransform interpreted AND re-evaluates the
  * captured `split` subtree once per produced element — an O(words²)
  * per-row blowup on the LSH dedup hot path. This expression tokenizes
  * once and emits all windows in a single fused loop, and stays inside
  * whole-stage codegen via a static kernel call.
  */
case class WordShingles(child: Expression, n: Int, distinctOnly: Boolean = true)
    extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    if (distinctOnly) ShingleKernel.shingles(input.asInstanceOf[UTF8String], n)
    else ShingleKernel.shinglesAll(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = if (distinctOnly) "shingles" else "shinglesAll"
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.$kernel($c, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleExpressions {
  def wordShinglesNative(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      WordShingles(org.apache.spark.sql.graft.ColumnBridge.expression(text), n))

  /** counting form: every contiguous n-gram, duplicates preserved */
  def wordShinglesAll(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      WordShingles(org.apache.spark.sql.graft.ColumnBridge.expression(text), n,
        distinctOnly = false))
}
