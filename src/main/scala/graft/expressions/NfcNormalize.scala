package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization as a native Catalyst expression.
  *
  * Text canonicalization is the step BEFORE every content-keyed operator
  * in a training-data pipeline: "café" as U+0065 U+0301 (decomposed) and
  * as U+00E9 (precomposed) are the same text to a human and a tokenizer,
  * but different bytes to sha2-based exact dedup (q40), memo keys (C6),
  * and shingle hashing (q41) — un-normalized corpora silently leak
  * duplicates through all of them. Spark has no built-in normalizer, so
  * this wraps `java.text.Normalizer` (NFC, the W3C/WHATWG interchange
  * form) with `doGenCode`, keeping the hot path inside whole-stage
  * codegen instead of breaking the span with a UDF.
  *
  * Fast path (ADVICE r4): pure-ASCII input — the overwhelming majority
  * of a real corpus — is detected with a zero-allocation scan of the
  * UTF8String bytes (ASCII is always NFC) and returned as-is; only
  * non-ASCII rows pay the String copy for `Normalizer.isNormalized`,
  * and only rows that are actually denormalized pay the normalize.
  *
  * DuckDB twin for oracles: `nfc_normalize(text)`.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Called from both interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    // zero-alloc ASCII pre-check on the raw bytes: in UTF-8, all-ASCII
    // means every byte has the high bit clear, and ASCII text is NFC
    // by definition
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
