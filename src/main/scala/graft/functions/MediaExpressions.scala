package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Static kernel shared by interpreted eval and generated code. */
object MediaKernel {
  /** Windowed energy over an opaque binary payload read as unsigned 8-bit
    * PCM samples: for each window `w` starting at byte `w*hop`, the EXACT
    * integer Σ (b−128)² over `min(window, len − w*hop)` samples. Windows
    * cover every byte (`(len−1)/hop + 1` of them, final ones partial);
    * the integer form keeps the oracle comparison order-independent —
    * RMS is `sqrt(energy / n_samples)` for callers that want it.
    */
  def byteWindowEnergy(payload: Array[Byte], window: Int, hop: Int): ArrayData = {
    val len = payload.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val nWin = (len - 1) / hop + 1
    val out = new Array[Any](nWin)
    var w = 0
    while (w < nWin) {
      val start = w * hop
      val end = math.min(start + window, len)
      var s = 0L
      var i = start
      while (i < end) {
        val d = (payload(i) & 0xff) - 128
        s += (d * d).toLong
        i += 1
      }
      out(w) = s
      w += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass silence strip over NON-OVERLAPPING `window`-byte windows
    * (window == hop, so every byte belongs to exactly one window and the
    * rebuild is unambiguous): kept windows — those with energy
    * Σ (b−128)² STRICTLY above `maxEnergy` — are copied into the output
    * in order. Linear in the payload: one energy scan plus one
    * arraycopy per kept window into a single pre-sized buffer, never a
    * growing-accumulator concat (the higher-order `aggregate`/`concat`
    * form copies the accumulator per step — O(windows²) bytes for one
    * row, a stalled task at real audio sizes).
    */
  def byteWindowStrip(payload: Array[Byte], window: Int,
      maxEnergy: Long): Array[Byte] = {
    val len = payload.length
    if (len == 0) return Array.emptyByteArray
    val nWin = (len - 1) / window + 1
    val out = new Array[Byte](len)
    var outLen = 0
    var w = 0
    while (w < nWin) {
      val start = w * window
      val end = math.min(start + window, len)
      var s = 0L
      var i = start
      while (i < end) {
        val d = (payload(i) & 0xff) - 128
        s += (d * d).toLong
        i += 1
      }
      if (s > maxEnergy) {
        System.arraycopy(payload, start, out, outLen, end - start)
        outLen += end - start
      }
      w += 1
    }
    if (outLen == len) out else java.util.Arrays.copyOf(out, outLen)
  }
}

/** Per-window audio energy as ONE codegen'd pass per row.
  *
  * The per-byte alternative (explode a position sequence, `substr` each
  * byte, re-group) shuffles O(bytes) rows to rebuild what a single fused
  * loop computes in place; this expression stays inside whole-stage
  * codegen and emits one array element per window. With `hop < window`
  * the loop touches each byte `window/hop` times — still arithmetic on
  * in-cache bytes, never row traffic.
  */
case class ByteWindowEnergy(child: Expression, window: Int, hop: Int)
    extends UnaryExpression {
  require(window >= 1 && hop >= 1, s"window/hop must be >= 1, got $window/$hop")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "byte_window_energy"

  override def nullSafeEval(input: Any): Any =
    MediaKernel.byteWindowEnergy(input.asInstanceOf[Array[Byte]], window, hop)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MediaKernel.byteWindowEnergy($c, $window, $hop)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Silence strip as ONE codegen'd pass per row — the ACT sibling of
  * [[ByteWindowEnergy]]: emits the payload rebuilt from only its
  * above-threshold non-overlapping windows. Null in, null out
  * (UnaryExpression's null-safe contract), matching the null contract of
  * the other per-row media passes.
  */
case class ByteWindowStrip(child: Expression, window: Int, maxEnergy: Long)
    extends UnaryExpression {
  require(window >= 1, s"window must be >= 1, got $window")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "byte_window_strip"

  override def nullSafeEval(input: Any): Any =
    MediaKernel.byteWindowStrip(input.asInstanceOf[Array[Byte]], window, maxEnergy)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MediaKernel.byteWindowStrip($c, $window, ${maxEnergy}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediaExpressions {
  def byteWindowEnergyNative(payload: Column, window: Int, hop: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ByteWindowEnergy(
        org.apache.spark.sql.graft.ColumnBridge.expression(payload),
        window, hop))

  def byteWindowStripNative(payload: Column, window: Int, maxEnergy: Long): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ByteWindowStrip(
        org.apache.spark.sql.graft.ColumnBridge.expression(payload),
        window, maxEnergy))
}
