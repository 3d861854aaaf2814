package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native average-hash of a binary blob: `cells` byte-sum grid cells at
  * proportional offsets, bit k set iff cell k's sum is strictly above
  * the blob mean (`cell * cells > total` — exact integer compare), bits
  * packed little-endian into one BIGINT.
  *
  * Replaces the hex()+substring+conv HOF formulation in
  * graft.queries.Multimodal.mediaPhash (r10 verdict: ~2 string ops PER
  * INPUT BYTE inside the q209 projection made it the catalog's biggest
  * line item). Same grid, same bit rule, same integer math — value-equal
  * to the HOF and to the DuckDB oracle mirror — evaluated as one tight
  * byte loop inside whole-stage codegen, zero allocation beyond the
  * cells array.
  *
  * Cell boundaries are floor(k*nb/cells) by exact integer division;
  * the HOF/oracle compute floor over a double quotient, identical for
  * any k*nb < 2^53 (nb is an array length <= 2^31, cells <= 64).
  *
  * Contract: blob non-null with at least `cells` bytes (the q209
  * filter shape — shorter blobs carry no stable signature and are
  * excluded upstream); `cells` in [1, 63] so the hash fits a signed
  * BIGINT with no sign bit.
  */
case class MediaPhash(child: Expression, cells: Int) extends UnaryExpression {
  require(cells >= 1 && cells <= 63,
    s"media_phash: cells must be in [1, 63], got $cells")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"media_phash requires a binary argument, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "media_phash"

  override def nullSafeEval(blob: Any): Any =
    MediaPhash.phash(blob.asInstanceOf[Array[Byte]], cells)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.expressions.MediaPhash.phash($b, $cells)")

  override protected def withNewChildInternal(newChild: Expression): MediaPhash =
    copy(child = newChild)
}

object MediaPhash {
  /** Sequential byte-sum grid + mean-threshold pack; called from
    * interpreted eval and codegen.
    */
  def phash(blob: Array[Byte], cells: Int): Long = {
    val nb = blob.length.toLong
    require(nb >= cells,
      s"media_phash: blob of $nb bytes is below the $cells-cell grid " +
        "(filter octet_length >= cells upstream)")
    val sums = new Array[Long](cells)
    var total = 0L
    var k = 0
    while (k < cells) {
      var p = k * nb / cells
      val end = (k + 1) * nb / cells
      var s = 0L
      while (p < end) { s += (blob(p.toInt) & 0xff); p += 1 }
      sums(k) = s
      total += s
      k += 1
    }
    var ph = 0L
    k = 0
    while (k < cells) {
      if (sums(k) * cells > total) ph |= 1L << k
      k += 1
    }
    ph
  }
}
