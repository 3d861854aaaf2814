package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native box-filter downsample of an s16le PCM stream to a fixed
  * number of frames — the audio twin of [[LumaResize]] (images resize
  * a luma plane; audio resamples a waveform): `array<bigint>` of
  * length `frames` where element k is the SIGNED integer mean —
  * sum / len, truncating division, matching both Scala `/` and
  * DuckDB `//` — of the samples in the proportional window
  * [floor(k·n/frames), floor((k+1)·n/frames)).
  *
  * Signed means (unlike [[AudioPhash]]'s |sample| energies) keep the
  * waveform's shape: the output is a fixed-length coarse rendering of
  * the signal that a model-input packer, envelope display, or
  * alignment stage consumes — the rate-normalizing step every audio
  * loader runs before batching variable-duration clips. Integer-exact
  * throughout, so the catalog entry (q216) is DuckDB-oracle-checkable
  * bit for bit.
  *
  * Contract: blob non-null with at least `2 * frames` bytes (every
  * window needs a complete sample; filter
  * `octet_length >= 2 * frames` upstream); `frames` in [1, 4096]
  * (bounds the per-row output allocation, as [[LumaResize]] does).
  */
case class AudioResample(child: Expression, frames: Int)
    extends UnaryExpression {
  require(frames >= 1 && frames <= 4096,
    s"audio_resample: frames must be in [1, 4096], got $frames")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"audio_resample requires a binary argument, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "audio_resample"

  override def nullSafeEval(blob: Any): Any =
    AudioResample.resample(blob.asInstanceOf[Array[Byte]], frames)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      b => s"graft.expressions.AudioResample.resample($b, $frames)")

  override protected def withNewChildInternal(
      newChild: Expression): AudioResample =
    copy(child = newChild)
}

object AudioResample {
  /** Sequential signed window means; called from interpreted eval and
    * codegen.
    */
  def resample(pcm: Array[Byte], frames: Int): ArrayData = {
    val n = (pcm.length / 2).toLong
    require(n >= frames,
      s"audio_resample: $n samples is below the $frames-frame target " +
        "(filter octet_length >= 2 * frames upstream)")
    // Primitive Array[Long] + UnsafeArrayData: this runs per row inside
    // a generator projection, so per-element boxing into Array[Any]
    // would allocate on the hot path (ADVICE r12).
    val out = new Array[Long](frames)
    var k = 0
    while (k < frames) {
      var p = k * n / frames
      val end = (k + 1) * n / frames
      val len = end - p
      var s = 0L
      while (p < end) {
        val i = p.toInt
        s += ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toLong
        p += 1
      }
      out(k) = s / len // truncating division == DuckDB's integer //
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
