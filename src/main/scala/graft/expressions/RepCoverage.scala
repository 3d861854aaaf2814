package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native covered-character counts of one document's repetition
  * statistics (the q198 Gopher-battery kernel — VERDICT r14 #3): over
  * a words array, returns
  * `struct<top2_chars, top3_chars, dup5_chars : bigint>` where
  * `top{2,3}_chars` = occurrences × code-point length of the most
  * frequent word 2-/3-gram (ties broken by the SMALLEST gram in
  * binary collation — identical to the oracle's
  * `ORDER BY count DESC, g` row_number tiebreak) and `dup5_chars` =
  * Σ occurrences × code-point length over every 5-gram occurring 2+
  * times. Grams are space-joined words, lengths are code-point counts
  * (Spark/DuckDB `length` semantics), and the tiebreak compares UTF-8
  * bytes ([[UTF8String.compareTo]] is unsigned byte order = binary
  * collation = code-point order), so the kernel cannot diverge from
  * the declarative DuckDB oracle on non-ASCII text.
  *
  * Why native (VERDICT r14 #3): the Scala-UDF form
  * (`TextAnalytics.repCoverageOf`, kept as this expression's
  * spec-level cross-check) was the engine's one remaining hot per-row
  * kernel outside whole-stage codegen, paying catalyst→Scala ser/de of
  * every document's words array plus a result-struct encoder per row.
  * This expression stays inside the codegen span and works directly on
  * the array's [[UTF8String]]s — no byte copying, no String decode:
  * grams are built with [[UTF8String.concatWs]], counted in one hash
  * map per gram size, and compared as UTF8Strings.
  *
  * An empty or all-filtered words array has no n-grams: all three
  * counts are 0 (the battery's pass-with-fraction-0 contract for short
  * docs). A null array returns null (the battery's coalesce maps the
  * fields to 0, preserving the previous UDF-on-null output exactly).
  */
case class RepCoverage(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rep_coverage requires an array<string> argument, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("top2_chars", LongType, nullable = false),
    StructField("top3_chars", LongType, nullable = false),
    StructField("dup5_chars", LongType, nullable = false)))

  override def prettyName: String = "rep_coverage"

  override def nullSafeEval(arr: Any): Any =
    RepCoverage.cover(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.RepCoverage.cover($a)")

  override protected def withNewChildInternal(newChild: Expression): RepCoverage =
    copy(child = newChild)
}

object RepCoverage {
  private val Space = UTF8String.fromString(" ")

  /** Gram occurrence counts for one gram size: space-joined word
    * windows counted in a hash map ([[UTF8String]] hashes/compares its
    * bytes, so no decoding happens). Null elements cannot occur — the
    * battery's words come from a split+filter, and stray nulls would
    * have thrown in the UDF form too.
    */
  private def gramCounts(words: Array[UTF8String], n: Int): java.util.HashMap[UTF8String, Array[Long]] = {
    val m = new java.util.HashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i + n <= words.length) {
      val g = UTF8String.concatWs(Space,
        java.util.Arrays.copyOfRange(words, i, i + n): _*)
      val c = m.get(g)
      if (c == null) m.put(g, Array(1L)) else c(0) += 1L
      i += 1
    }
    m
  }

  /** occurrences × code-point length of the most frequent gram, ties
    * to the binary-smallest gram (== the oracle's
    * `ORDER BY count DESC, g`); 0 when there are no grams.
    */
  private def topChars(m: java.util.HashMap[UTF8String, Array[Long]]): Long = {
    var bestG: UTF8String = null
    var bestC = 0L
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c > bestC || (c == bestC && bestG != null && e.getKey.compareTo(bestG) < 0)) {
        bestG = e.getKey; bestC = c
      }
    }
    if (bestG == null) 0L else bestC * bestG.numChars().toLong
  }

  /** One document's (top2_chars, top3_chars, dup5_chars); called from
    * interpreted eval and codegen.
    */
  def cover(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val words = new Array[UTF8String](n)
    var i = 0
    while (i < n) { words(i) = arr.getUTF8String(i); i += 1 }
    var dup5 = 0L
    val it = gramCounts(words, 5).entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c >= 2L) dup5 += c * e.getKey.numChars().toLong
    }
    new GenericInternalRow(Array[Any](
      topChars(gramCounts(words, 2)), topChars(gramCounts(words, 3)), dup5))
  }
}
