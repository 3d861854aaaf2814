package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native box-filter resample of a luma byte signal to a fixed number
  * of cells — the standalone "resize" stage of the multimodal family
  * (SURVEY §2.2 north star: decode / feature-extract / RESIZE /
  * frame-sample). [[MediaPhash]] embeds this grid and immediately
  * thresholds it into sign bits; this expression returns the resampled
  * signal itself, `array<bigint>` of length `cells` where element k is
  * the integer mean — floor(sum / len) — of the proportional window
  * [floor(k·nb/cells), floor((k+1)·nb/cells)).
  *
  * Proportional windows make the output alignment-normalizing: two
  * encodings of the same content at different lengths land on
  * comparable fixed-size vectors (the property q209's hash relies on;
  * here the full 8-bit values survive, so downstream consumers can do
  * distance math, quantization, or model-input packing rather than
  * just near-dup banding). Integer-exact throughout — floor division,
  * no floating point — so the catalog entry (q214) is
  * DuckDB-oracle-checkable bit for bit.
  *
  * Contract: blob non-null with at least `cells` bytes (every window
  * must be non-empty; filter `octet_length >= cells` upstream — the
  * same exclusion rule as [[MediaPhash]]); `cells` in [1, 4096] (a
  * resize target, not a hash width — 4096 bounds the per-row output
  * allocation).
  */
case class LumaResize(child: Expression, cells: Int) extends UnaryExpression {
  require(cells >= 1 && cells <= 4096,
    s"luma_resize: cells must be in [1, 4096], got $cells")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"luma_resize requires a binary argument, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "luma_resize"

  override def nullSafeEval(blob: Any): Any =
    LumaResize.resize(blob.asInstanceOf[Array[Byte]], cells)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.expressions.LumaResize.resize($b, $cells)")

  override protected def withNewChildInternal(newChild: Expression): LumaResize =
    copy(child = newChild)
}

object LumaResize {
  /** Sequential window means; called from interpreted eval and codegen. */
  def resize(blob: Array[Byte], cells: Int): ArrayData = {
    val nb = blob.length.toLong
    require(nb >= cells,
      s"luma_resize: blob of $nb bytes is below the $cells-cell target " +
        "(filter octet_length >= cells upstream)")
    // Primitive Array[Long] + UnsafeArrayData — no per-element boxing
    // in the per-row hot path (ADVICE r12).
    val out = new Array[Long](cells)
    var k = 0
    while (k < cells) {
      var p = k * nb / cells
      val end = (k + 1) * nb / cells
      val len = end - p
      var s = 0L
      while (p < end) { s += (blob(p.toInt) & 0xff); p += 1 }
      out(k) = s / len
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
