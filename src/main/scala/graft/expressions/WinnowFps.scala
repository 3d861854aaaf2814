package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (Schleimer et al., SIGMOD'03): the
  * sorted distinct set of sliding-window minima over the md5 hex
  * digests of every char `k`-gram of the input.
  *
  * Semantics are exactly the composable form
  * `array_sort(array_distinct(transform(sequence(w, n), i ->
  * array_min(slice(grams, i-w+1, w)))))` with
  * `grams = transform(sequence(1, n), p -> md5(substr(text, p, k)))` —
  * but that HOF pile evaluates ~2 interpreted boxed lambdas per
  * character of corpus text, which dominates q61's runtime. This
  * expression does one tight loop per row: a reused MessageDigest per
  * gram and a monotonic-deque sliding minimum (O(n) total compares
  * amortized), no per-element boxing.
  *
  * Returns null for null input; rows with fewer than k + w - 1 chars
  * (no full window) yield an empty array — callers filter them out.
  * ASCII fast path encodes bytes once; non-ASCII falls back to
  * per-gram UTF-8 encoding of the char substring, matching Spark's
  * `md5(substr(...))` UTF-16-unit indexing.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, s"winnow_fps: k=$k and w=$w must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length - k + 1
    if (n < w) return new GenericArrayData(Array.empty[Any])

    val md = MessageDigest.getInstance("MD5")
    // ASCII fast path: byte offsets == char offsets, encode once.
    var ascii = true
    var ci = 0
    while (ascii && ci < s.length) { if (s.charAt(ci) > 127) ascii = false; ci += 1 }
    val bytes = if (ascii) s.getBytes(StandardCharsets.US_ASCII) else null

    val minima = new java.util.TreeSet[String]()
    // Monotonic deque of (gram index, digest): front is the window min.
    val dqIdx = new Array[Int](n)
    val dqHex = new Array[String](n)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      md.reset()
      if (ascii) md.update(bytes, i, k)
      else md.update(s.substring(i, i + k).getBytes(StandardCharsets.UTF_8))
      val hex = WinnowFps.toHex(md.digest())
      // Evict dominated tail entries, then expired front entries.
      while (tail > head && dqHex(tail - 1).compareTo(hex) >= 0) tail -= 1
      dqIdx(tail) = i; dqHex(tail) = hex; tail += 1
      if (dqIdx(head) <= i - w) head += 1
      if (i >= w - 1) minima.add(dqHex(head))
      i += 1
    }
    val out = new Array[Any](minima.size)
    val it = minima.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  private val HexDigits = "0123456789abcdef".toCharArray

  def toHex(d: Array[Byte]): String = {
    val cs = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      cs(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      cs(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new String(cs)
  }
}
