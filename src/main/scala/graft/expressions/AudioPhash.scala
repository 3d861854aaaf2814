package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native perceptual hash of an s16le PCM stream — the audio twin of
  * [[MediaPhash]]: `cells` proportional sample windows, each reduced
  * to its absolute-amplitude energy sum; bit k set iff window k's
  * energy is strictly above the stream mean (`energy * cells > total`
  * — exact integer compare), bits packed little-endian into one
  * BIGINT.
  *
  * Why energy over SAMPLES and not [[MediaPhash]] over the raw bytes:
  * s16le interleaves low and high bytes, so a byte-granularity grid
  * mixes magnitude bits with sign/high bits and the signature stops
  * tracking the waveform. Folding |sample| per window makes the
  * signature an energy-envelope sketch, which is what survives
  * re-encoding: it is EXACTLY invariant under uniform gain (volume)
  * changes that stay off the rails — scaling every sample by g scales
  * both sides of `energy_k * cells > total` by g — and stable under
  * small local edits, the same contract the image hash has for
  * brightness-preserving re-encodes. Proportional windows normalize
  * alignment across durations, like the image grid normalizes across
  * resolutions.
  *
  * Integer-exact throughout (|-32768| included — the fold is in
  * longs), so the catalog entry (q215) is DuckDB-oracle-checkable bit
  * for bit, and the banding downstream is the standard q209
  * OR-band + bucket-cap + Hamming-verify pipeline unchanged.
  *
  * Contract: blob non-null with at least `2 * cells` bytes (every
  * window needs a complete sample; filter
  * `octet_length >= 2 * cells` upstream — the q215 shape); `cells` in
  * [1, 63] so the hash fits a signed BIGINT with no sign bit.
  */
case class AudioPhash(child: Expression, cells: Int) extends UnaryExpression {
  require(cells >= 1 && cells <= 63,
    s"audio_phash: cells must be in [1, 63], got $cells")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"audio_phash requires a binary argument, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "audio_phash"

  override def nullSafeEval(blob: Any): Any =
    AudioPhash.phash(blob.asInstanceOf[Array[Byte]], cells)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.expressions.AudioPhash.phash($b, $cells)")

  override protected def withNewChildInternal(newChild: Expression): AudioPhash =
    copy(child = newChild)
}

object AudioPhash {
  /** Sequential window energy + mean-threshold pack; called from
    * interpreted eval and codegen.
    */
  def phash(pcm: Array[Byte], cells: Int): Long = {
    val n = (pcm.length / 2).toLong
    require(n >= cells,
      s"audio_phash: $n samples is below the $cells-window grid " +
        "(filter octet_length >= 2 * cells upstream)")
    val sums = new Array[Long](cells)
    var total = 0L
    var k = 0
    while (k < cells) {
      var p = k * n / cells
      val end = (k + 1) * n / cells
      var s = 0L
      while (p < end) {
        val i = p.toInt
        val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toLong
        s += (if (v < 0) -v else v)
        p += 1
      }
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
