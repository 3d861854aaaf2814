package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native waveform statistics over a signed 16-bit little-endian PCM
  * byte stream — the audio member of the multimodal feature-extract
  * family (images grid through [[MediaPhash]]; audio folds through
  * this). One pass over the samples yields, as `array<bigint>`:
  *
  *   1. `n_samples`  — floor(bytes / 2); a trailing odd byte is ignored
  *   2. `peak`       — max |sample| (|-32768| = 32768, exact)
  *   3. `sum_sq`     — sum of sample² (≤ 2^30 per sample: 32768² =
  *                     2^30; even a maximal ~2 GiB blob of 2^30
  *                     samples sums below 2^60, inside a signed 64-bit)
  *   4. `n_clipped`  — count of |sample| ≥ 32767 (full-scale hits on
  *                     either rail — the digital-clipping detector)
  *   5. `zero_cross` — count of i in [1, n) where sign(s[i-1]) ≠
  *                     sign(s[i]), sign = (x < 0); the classic coarse
  *                     pitch/noisiness proxy
  *
  * Everything is integer-exact (RMS = sqrt(sum_sq / n) is left to the
  * consumer so the stored stats stay bit-stable), which is what makes
  * the catalog entry (q213) DuckDB-oracle-checkable byte for byte.
  *
  * Where the PCM comes from is the [[graft.multimodal.PcmDecoder]]
  * seam: the fixture corpus ships no real audio, so the catalog runs
  * the identity decoder (blob bytes read AS s16le PCM — deterministic,
  * oracle-mirrorable); a real deployment swaps in a container parser
  * ([[graft.multimodal.WavPcm]] proves the swap with a real RIFF/WAVE
  * reader, spec-driven through this same expression).
  *
  * Contract: blob non-null with at least 2 bytes (filter
  * `octet_length >= 2` upstream — the q213 shape; a blob with no
  * complete sample has no waveform).
  */
case class AudioStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"audio_stats requires a binary argument, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "audio_stats"

  override def nullSafeEval(blob: Any): Any =
    AudioStats.stats(blob.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.expressions.AudioStats.stats($b)")

  override protected def withNewChildInternal(newChild: Expression): AudioStats =
    copy(child = newChild)
}

object AudioStats {
  /** Sequential one-pass fold; called from interpreted eval and
    * codegen.
    */
  def stats(pcm: Array[Byte]): ArrayData = {
    val n = pcm.length / 2
    require(n >= 1,
      "audio_stats: blob below one s16le sample (filter octet_length >= 2 upstream)")
    var peak = 0L
    var sumSq = 0L
    var clipped = 0L
    var crossings = 0L
    var prevNeg = false
    var i = 0
    while (i < n) {
      // s16le: low byte first, high byte carries the sign.
      val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toLong
      val a = if (v < 0) -v else v
      if (a > peak) peak = a
      sumSq += v * v
      if (a >= 32767) clipped += 1
      val neg = v < 0
      if (i > 0 && neg != prevNeg) crossings += 1
      prevNeg = neg
      i += 1
    }
    new GenericArrayData(Array[Any](n.toLong, peak, sumSq, clipped, crossings))
  }
}
