package graft.multimodal

/** The q209 decode boundary as code, not comment: a perceptual hash
  * grids over a one-dimensional luma byte signal; where that signal
  * comes from is this trait. The fixture corpus ships no real media, so
  * the catalog entry runs [[IdentityLuma]] (the documented stub: the
  * blob's bytes read AS the signal — deterministic, oracle-mirrorable);
  * a real deployment swaps in a format decoder at exactly this seam.
  * [[BmpLuma]] proves the swap with a trivial real format the JDK needs
  * no codec for (uncompressed 24-bit BMP), spec-driven end-to-end
  * through the same band+verify pipeline in MultimodalSpec.
  *
  * Same pattern as graft.pipeline.ModelClient: the engine owns the
  * plumbing (grid, banding, bucket caps, Hamming verify — all real and
  * measured), the deployment owns the codec.
  */
trait LumaDecoder extends BlobDecoder {
  /** Decode an opaque blob into the luma byte signal the perceptual
    * hash grids over. Must be deterministic; returns row-major
    * top-down luma for images, or any stable 1-D projection for other
    * media. Throws on malformed input (the caller decides whether to
    * quarantine — q209's catalog shape filters on signal length only).
    */
  override def decode(blob: Array[Byte]): Array[Byte]
}

/** Stub decoder: the blob's byte stream read as the luma signal. Keeps
  * the catalog entry fully native (no UDF in the projection — the
  * MediaPhash expression runs directly over the blob column) and
  * DuckDB-mirrorable, which is what makes q209 oracle-checkable.
  */
case object IdentityLuma extends LumaDecoder {
  val name = "identity"
  def decode(blob: Array[Byte]): Array[Byte] = blob
}

/** Shared implementation for the JDK-codec image decoders
  * ([[JpegLuma]], [[PngLuma]]): javax.imageio decodes the container
  * (the JDK ships JPEG and PNG codecs — zero external dependencies),
  * then the SAME exact integer Rec.601 luma map as [[BmpLuma]]
  * ((77R + 150G + 29B) >> 8) over the ARGB raster, emitted row-major
  * top-down. The magic-byte check keeps each decoder honest about its
  * format (a JpegLuma that silently decodes PNG would hide
  * misrouted-content bugs at the seam).
  *
  * Determinism: the decode is pure JDK code — stable for a pinned JVM,
  * which is the same determinism class as every engine decision path
  * (the perceptual hash downstream is integer-exact regardless).
  */
sealed abstract class ImageIoLuma(val name: String,
                                  magic: Array[Int]) extends LumaDecoder {
  def decode(blob: Array[Byte]): Array[Byte] = {
    require(blob.length > magic.length &&
        magic.indices.forall(i => (blob(i) & 0xff) == magic(i)),
      s"$name: magic bytes do not match")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    require(img != null, s"$name: not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val out = new Array[Byte](w * h)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      out(i) = ((77 * ((p >>> 16) & 0xff) + 150 * ((p >>> 8) & 0xff)
        + 29 * (p & 0xff)) >> 8).toByte
      i += 1
    }
    out
  }
}

/** JFIF/JPEG decoder via the JDK's built-in codec (SOI marker FFD8). */
case object JpegLuma extends ImageIoLuma("jpeg", Array(0xff, 0xd8))

/** PNG decoder via the JDK's built-in codec (8-byte PNG signature). */
case object PngLuma extends ImageIoLuma("png",
  Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))

/** Real-format decoder for uncompressed 24-bit BMP (BITMAPINFOHEADER,
  * BI_RGB): parses the pixel-array offset, dimensions, and row padding
  * from the header, converts BGR triples to integer Rec.601 luma
  * ((77R + 150G + 29B) >> 8), and emits row-major TOP-DOWN bytes
  * (flipping BMP's bottom-up row order, honoring negative-height
  * top-down files). No floating point anywhere — bit-stable across
  * JVMs, like every decision path in this engine.
  */
case object BmpLuma extends LumaDecoder {
  val name = "bmp24"

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  def decode(blob: Array[Byte]): Array[Byte] = {
    require(blob.length >= 54 && blob(0) == 'B' && blob(1) == 'M',
      "bmp24: not a BMP file")
    val pixOff = i32(blob, 10)
    val width = i32(blob, 18)
    val rawH = i32(blob, 22)
    val bpp = u16(blob, 28)
    val compression = i32(blob, 30)
    require(bpp == 24 && compression == 0,
      s"bmp24: only uncompressed 24-bit supported, got bpp=$bpp compression=$compression")
    val topDown = rawH < 0
    val height = math.abs(rawH)
    require(width > 0 && height > 0, s"bmp24: bad dimensions ${width}x$rawH")
    val rowBytes = (width * 3 + 3) / 4 * 4 // rows pad to 4-byte multiples
    require(blob.length >= pixOff + rowBytes * height, "bmp24: truncated pixel array")
    val out = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      var p = pixOff + srcRow * rowBytes
      var x = 0
      while (x < width) {
        val bl = blob(p) & 0xff
        val g = blob(p + 1) & 0xff
        val r = blob(p + 2) & 0xff
        out(y * width + x) = ((77 * r + 150 * g + 29 * bl) >> 8).toByte
        x += 1
        p += 3
      }
      y += 1
    }
    out
  }
}
