package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature of a shingle array: for each hash function
  * k in [0, funcs), the minimum over the array of
  * `sha256_hex(k || ":" || shingle)` — bit-equal to the column
  * formulation it replaces in graft.queries.Dedup
  * (`min(sha2(concat_ws(":", lit(k), shingle), 256))` per k, and the
  * per-row `array_min(transform(...))` twin) and to the DuckDB oracle
  * CTE mirror, so every dedup oracle hash is unchanged.
  *
  * Why native (r11 verdict #1): the column form pays, PER (shingle, k):
  * a concat_ws string build, a fresh MessageDigest instance, a 64-char
  * hex encode, and an UTF8String min-compare — 9× each per shingle,
  * plus 9 materialized `transform` arrays in the per-row twin. This
  * expression runs ONE pass over the array: the "k:"-prefixed message
  * buffer is built once per shingle with only byte 0 rewritten across
  * the 9 functions, the digest instance is thread-cached, running
  * minima are compared as raw 32-byte digests (unsigned byte order ==
  * lowercase-hex lexicographic order, since the per-byte hex map is
  * monotone and '0'..'9' < 'a'..'f' in ASCII), and only the `funcs`
  * final minima are hex-encoded.
  *
  * Two call shapes cover both engine paths:
  *   - batch aggregate (Dedup.minhashTable): project
  *     `minhash_sigs(array(shingle))` per exploded row — the 9 digests
  *     for one shingle in one pass — then `min(element_at(h, k+1))`
  *     keeps Spark's partial (map-side) aggregation;
  *   - per-row / streaming (Dedup.bandsPerRow, the q208 gate):
  *     `minhash_sigs(sh)` over the doc's whole distinct-shingle array
  *     replaces 9 array passes with one.
  *
  * Contract: the input array is non-empty with non-null elements (both
  * call sites filter `size(words) >= 3`, so a surviving doc has at
  * least one 3-shingle; the aggregate shape wraps one non-null
  * shingle). `funcs` in [1, 10] so the salt prefix is a single ASCII
  * digit, matching `lit(k.toString)` byte-for-byte.
  */
case class MinhashSigs(child: Expression, funcs: Int) extends UnaryExpression {
  require(funcs >= 1 && funcs <= 10,
    s"minhash_sigs: funcs must be in [1, 10], got $funcs")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires an array<string> argument, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(arr: Any): Any =
    MinhashSigs.sigs(arr.asInstanceOf[ArrayData], funcs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.MinhashSigs.sigs($a, $funcs)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

object MinhashSigs {
  /** One SHA-256 instance per task thread: getInstance + provider
    * lookup is measurable at ~9 digests per shingle; reset() between
    * messages is the documented reuse protocol.
    */
  private val digestPool = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("SHA-256")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  /** Unsigned lexicographic compare of two 32-byte digests — the same
    * order as UTF8String compare of their lowercase-hex encodings.
    */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      val v = d(i) & 0xff
      out(i * 2) = hexChars(v >>> 4).toByte
      out(i * 2 + 1) = hexChars(v & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Sequential one-pass minima; called from interpreted eval and
    * codegen.
    */
  def sigs(arr: ArrayData, funcs: Int): ArrayData = {
    val n = arr.numElements()
    require(n > 0,
      "minhash_sigs: empty shingle array (filter size(words) >= 3 upstream)")
    val md = digestPool.get()
    val mins = new Array[Array[Byte]](funcs)
    var i = 0
    while (i < n) {
      val sb = arr.getUTF8String(i).getBytes
      val buf = new Array[Byte](sb.length + 2)
      buf(1) = ':'
      System.arraycopy(sb, 0, buf, 2, sb.length)
      var k = 0
      while (k < funcs) {
        buf(0) = ('0' + k).toByte
        md.reset()
        md.update(buf)
        val d = md.digest()
        if (mins(k) == null || less(d, mins(k))) mins(k) = d
        k += 1
      }
      i += 1
    }
    val out = new Array[Any](funcs)
    var k = 0
    while (k < funcs) { out(k) = hex(mins(k)); k += 1 }
    new GenericArrayData(out)
  }
}
