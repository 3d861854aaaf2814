package graft.multimodal

/** The audio decode boundary as code (the same seam pattern as
  * [[LumaDecoder]] for images): waveform statistics
  * ([[graft.expressions.AudioStats]]) fold over a signed 16-bit
  * little-endian PCM byte stream; where that stream comes from is this
  * trait. The fixture corpus ships no real audio, so the catalog entry
  * (q213) runs [[IdentityPcm]] (the documented stub: the blob's bytes
  * read AS s16le PCM — deterministic, oracle-mirrorable); a real
  * deployment swaps in a container parser at exactly this seam.
  * [[WavPcm]] proves the swap with a real RIFF/WAVE chunk walker the
  * JVM needs no codec for, spec-driven end-to-end through the same
  * stats pipeline in MultimodalSpec.
  */
trait PcmDecoder extends BlobDecoder {
  /** Decode an opaque blob into raw s16le PCM bytes (interleaved if
    * multi-channel — stats fold over all channels). Must be
    * deterministic; throws on malformed input (the caller decides
    * whether to quarantine — q213's catalog shape filters on PCM
    * length only).
    */
  override def decode(blob: Array[Byte]): Array[Byte]
}

/** Stub decoder: the blob's byte stream read as s16le PCM. Keeps the
  * catalog entry fully native (no UDF in the projection — the
  * AudioStats expression runs directly over the blob column) and
  * DuckDB-mirrorable, which is what makes q213 oracle-checkable.
  */
case object IdentityPcm extends PcmDecoder {
  val name = "identity"
  def decode(blob: Array[Byte]): Array[Byte] = blob
}

/** Real-container decoder for RIFF/WAVE holding 16-bit integer PCM:
  * walks the chunk list (chunks are (fourcc, u32le size, payload),
  * word-aligned), validates the `fmt ` chunk — format tag 1
  * (WAVE_FORMAT_PCM) or the 0xFFFE extensible wrapper whose
  * sub-format GUID leads with 1, and 16 bits per sample — and returns
  * the `data` chunk's payload verbatim (already s16le, all channels
  * interleaved). No floating point, no javax.sound — a by-hand parse
  * of the published container layout, bit-stable across JVMs like
  * every decision path in this engine.
  */
case object WavPcm extends PcmDecoder {
  val name = "wav16"

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def decode(blob: Array[Byte]): Array[Byte] = {
    require(blob.length >= 44 && fourcc(blob, 0) == "RIFF" &&
        fourcc(blob, 8) == "WAVE",
      "wav16: not a RIFF/WAVE file")
    var off = 12
    var fmtOk = false
    var data: Array[Byte] = null
    while (off + 8 <= blob.length && (data == null || !fmtOk)) {
      val id = fourcc(blob, off)
      val size = u32(blob, off + 4)
      val payload = off + 8
      require(size >= 0 && payload + size <= blob.length,
        s"wav16: chunk '$id' of $size bytes overruns the container")
      id match {
        case "fmt " =>
          require(size >= 16, "wav16: fmt chunk below PCM header size")
          val tag = u16(blob, payload)
          val bits = u16(blob, payload + 14)
          // 0xFFFE = WAVE_FORMAT_EXTENSIBLE: the real format is the
          // first word of the sub-format GUID at payload+24.
          val effective =
            if (tag == 0xfffe && size >= 26) u16(blob, payload + 24) else tag
          require(effective == 1,
            s"wav16: only integer PCM supported, got format tag $tag")
          require(bits == 16,
            s"wav16: only 16-bit samples supported, got $bits")
          fmtOk = true
        case "data" =>
          require(fmtOk, "wav16: data chunk before fmt chunk")
          data = java.util.Arrays.copyOfRange(
            blob, payload, payload + size.toInt)
        case _ => // LIST/INFO/fact/cue — skip
      }
      off = payload + size.toInt + (size.toInt & 1) // chunks word-align
    }
    require(data != null, "wav16: no data chunk")
    data
  }
}
