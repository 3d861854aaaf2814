package graft.multimodal

/** The video decode boundary as code — the fourth modality's seam
  * (images: [[LumaDecoder]], audio: [[PcmDecoder]]): a container blob
  * in, the per-frame luma byte signals out, in stream order. Video
  * differs from the scalar seams only in arity — one blob yields MANY
  * signals — so the trait returns the frame sequence and the query
  * layer explodes it; everything downstream of the seam (frame
  * sampling, per-frame perceptual hash, temporally-aligned banding,
  * Hamming verify, quorum) is shared, real, and measured.
  *
  * The fixture corpus ships no real video, so the catalog entry (q217)
  * runs [[IdentityFrames]] (the documented stub: fixed-stride slices
  * of the blob read AS luma planes — deterministic, fully native,
  * oracle-mirrorable); a real deployment swaps in a container parser at
  * exactly this seam. [[AviMjpegFrames]] proves the swap with a by-hand
  * RIFF/AVI chunk walker (the RIFF sibling of [[WavPcm]]'s WAVE walker)
  * whose per-frame payloads decode through the existing [[JpegLuma]] —
  * spec-driven end-to-end through the same near-dup pipeline in
  * MultimodalSpec on a synthesized real AVI.
  */
trait FrameDecoder extends Serializable {
  def name: String

  /** Decode an opaque container blob into per-frame luma byte signals
    * in stream order. Must be deterministic; throws on malformed input
    * (the caller decides whether to quarantine). Frame sampling happens
    * DOWNSTREAM in the plan — a production decoder may additionally
    * seek via the container's frame index (AVI `idx1`) to avoid
    * decoding dropped frames; this in-JVM walker decodes sequentially,
    * which is the honest cost model for index-less streams.
    */
  def decodeFrames(blob: Array[Byte]): Seq[Array[Byte]]
}

/** Stub decoder: the blob sliced into [[IdentityFrames.NumFrames]]
  * UNIFORM PROPORTIONAL windows — frame k is bytes
  * [⌊k·nb/NF⌋, ⌊(k+1)·nb/NF⌋), each window's bytes read AS its luma
  * plane. This is q63's uniform-across-duration frame sampling as a
  * byte rule (every training loader normalizes variable-duration
  * videos to a fixed frame count), and — unlike a fixed byte stride —
  * it keeps frame ALIGNMENT stable between near-dup blobs of slightly
  * different length, the property the temporally-aligned band join
  * keys on. Keeps the catalog entry fully native — the frame explosion
  * is `sequence` + binary `substring`, the hash is the codegen'd
  * MediaPhash, no UDF anywhere — and DuckDB-mirrorable, which is what
  * makes q217 oracle-checkable.
  */
case object IdentityFrames extends FrameDecoder {
  /** Stub frame count: 8 proportional windows per blob (real decoders
    * emit the container's own frame sequence — the downstream pipeline
    * is frame-count-free).
    */
  val NumFrames = 8

  val name = "identity"

  def decodeFrames(blob: Array[Byte]): Seq[Array[Byte]] =
    (0 until NumFrames).map { k =>
      val st = (k.toLong * blob.length / NumFrames).toInt
      val en = ((k + 1).toLong * blob.length / NumFrames).toInt
      java.util.Arrays.copyOfRange(blob, st, en)
    }
}

/** Real-container decoder for MJPEG-in-AVI: walks the RIFF 'AVI ' list
  * structure by hand (chunks are (fourcc, u32le size, payload),
  * word-aligned — the same grammar as [[WavPcm]]'s WAVE walk), descends
  * into the 'movi' LIST (recursing through 'rec ' grouping sub-lists),
  * and decodes every compressed video chunk ('##dc' fourcc whose
  * payload opens with the JPEG SOI marker) through [[JpegLuma]] into a
  * row-major luma plane. No third-party codec: the container walk is a
  * by-hand parse of the published RIFF/AVI layout and the JPEG decode
  * is the JDK's built-in codec.
  */
case object AviMjpegFrames extends FrameDecoder {
  val name = "avi_mjpeg"

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** True for '00dc'/'01dc'/… — a stream's compressed video chunk. */
  private def isVideoChunk(id: String): Boolean =
    id.length == 4 && id(0).isDigit && id(1).isDigit &&
      id.substring(2) == "dc"

  def decodeFrames(blob: Array[Byte]): Seq[Array[Byte]] = {
    require(blob.length >= 12 && fourcc(blob, 0) == "RIFF" &&
        fourcc(blob, 8) == "AVI ",
      "avi_mjpeg: not a RIFF/AVI file")
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    // Walk one chunk run [off, end); descend into LISTs, decode '##dc'
    // payloads when inside the movi tree. Real AVI nests ~3 LIST
    // levels (AVI  > movi > rec ); the depth bound turns a malformed
    // blob of pathologically nested 12-byte LISTs (~80k levels/MB)
    // into the contract's IllegalArgumentException instead of a
    // StackOverflowError that could kill the executor task rather
    // than quarantine the row (ADVICE r13).
    val MaxListDepth = 64
    def walk(start: Int, end: Int, inMovi: Boolean, depth: Int): Unit = {
      require(depth <= MaxListDepth,
        s"avi_mjpeg: LIST nesting exceeds $MaxListDepth levels")
      var off = start
      while (off + 8 <= end) {
        val id = fourcc(blob, off)
        val size = u32(blob, off + 4)
        val payload = off + 8
        require(size >= 0 && payload + size <= end,
          s"avi_mjpeg: chunk '$id' of $size bytes overruns the container")
        if (id == "LIST") {
          require(size >= 4, "avi_mjpeg: LIST below list-type size")
          val listType = fourcc(blob, payload)
          walk(payload + 4, payload + size.toInt,
            inMovi || listType == "movi", depth + 1)
        } else if (inMovi && isVideoChunk(id)) {
          require(size >= 2 && (blob(payload) & 0xff) == 0xff &&
              (blob(payload + 1) & 0xff) == 0xd8,
            s"avi_mjpeg: video chunk '$id' is not a JPEG frame")
          frames += JpegLuma.decode(java.util.Arrays.copyOfRange(
            blob, payload, payload + size.toInt))
        } // hdrl/idx1/JUNK/strl members — skip
        off = payload + size.toInt + (size.toInt & 1) // chunks word-align
      }
    }

    walk(12, blob.length, inMovi = false, depth = 0)
    require(frames.nonEmpty, "avi_mjpeg: no video frames in movi list")
    frames.toSeq
  }
}
