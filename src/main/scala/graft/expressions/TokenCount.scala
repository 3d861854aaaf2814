package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-native token estimator.
  *
  * The reference counts tokens with the cl100k_base BPE
  * (`/root/reference/internal/cli/estimation.go:13-36`); that tokenizer is not
  * available offline, so the engine defines a deterministic BPE-ish
  * approximation as its canonical token count:
  *
  *   - a *word* is a maximal run of non-whitespace characters
  *   - a word of length L costs ceil(L / 4) tokens (BPE averages ~4 chars
  *     per token on English text), minimum 1
  *   - token_count(text) = sum over words; blank/empty text = 0
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode` so it stays
  * inside whole-stage codegen (a Scala UDF here would break the codegen span
  * and block column pruning on the scan side at 100 TB).
  *
  * The same definition is ANSI-SQL expressible for the DuckDB oracle:
  *   list_sum(list_transform(
  *     list_filter(regexp_split_to_array(text, '\s+'), w -> len(w) > 0),
  *     w -> CAST(ceil(len(w) / 4.0) AS BIGINT)))
  * (ASCII inputs only: Scala counts UTF-16 units, DuckDB counts codepoints.)
  *
  * Surface split: this coarse-but-oracle-expressible definition is the
  * canonical count for the chunker, memo pipeline, and every DuckDB-
  * checked query. The ESTIMATION surface (C2/C10 — `graft.Cli`'s
  * pre-flight cost table) uses [[TokenCountCl100k]], which reproduces
  * the published cl100k_base pre-tokenizer exactly and passes the
  * reference's own token-count test ranges (this one does not; its
  * regex is not RE2-expressible, so it cannot back an oracle).
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_count requires a string argument, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenCount.count($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {
  /** Single pass over the string; called from both interpreted eval and
    * generated code. Whitespace = `Character.isWhitespace` (matches `\s` for
    * ASCII inputs).
    */
  def count(s: String): Int = {
    var tokens = 0
    var runLen = 0
    var i = 0
    val n = s.length
    while (i < n) {
      if (Character.isWhitespace(s.charAt(i))) {
        if (runLen > 0) { tokens += (runLen + 3) / 4; runLen = 0 }
      } else {
        runLen += 1
      }
      i += 1
    }
    if (runLen > 0) tokens += (runLen + 3) / 4
    tokens
  }
}
