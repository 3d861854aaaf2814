package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** High-fidelity cl100k_base token estimator.
  *
  * The reference counts tokens with the cl100k_base BPE
  * (`/root/reference/internal/cli/estimation.go:13-36`). The BPE has two
  * stages: (1) a regex PRE-TOKENIZER that segments text into pieces
  * (contractions, words with one leading non-letter, 1-3 digit runs,
  * punctuation runs, whitespace), then (2) byte-pair merges WITHIN each
  * piece driven by a ~100k-entry learned merges table. Stage 1's split
  * regex is published with the tokenizer and is reproduced here
  * exactly. Stage 2 is implemented exactly too ([[BpeRanks]]: greedy
  * lowest-rank adjacent byte-pair merge), but its DATA — the
  * MIT-licensed `cl100k_base.tiktoken` ranks file — cannot be obtained
  * from this zero-egress build environment, so the table is pluggable
  * (env/property/classpath; see [[BpeRanks.loadDefault]]). When it is
  * absent, within-piece splitting is approximated: a piece of length L
  * costs max(1, ceil(L / 8)) tokens — common pieces (words up to 8
  * chars, single punctuation, contractions) cost 1, exactly like the
  * real BPE, and long/rare pieces degrade gracefully instead of
  * flattening to 1.
  *
  * Fidelity: this passes every published token-count range in the
  * reference's own test suite
  * (`/root/reference/internal/cli/estimation_test.go:8-75`), which the
  * coarse whitespace ceil(L/4) model ([[TokenCount]]) does not
  * ("Line 1\nLine 2\nLine 3" -> 5 vs expected 8..12; "test "*100 ->
  * 125 vs expected 95..105; this expression: 11 and 101, both matching
  * the real cl100k_base counts).
  *
  * Surface split (which counter is used where): the memo pipeline,
  * chunker, and every DuckDB-checked oracle keep [[TokenCount]] — its
  * definition is ANSI-SQL expressible, the pre-tokenizer regex is not
  * (lookahead + possessive quantifiers are outside RE2). This
  * expression is the ESTIMATION surface (C2/C10): `graft.Cli`'s
  * pre-flight token/cost table uses it, it is SQL-registered as
  * `token_count_cl100k`, and its unit spec pins the reference ranges.
  *
  * Native Catalyst expression with `doGenCode` (static-call codegen,
  * stays inside the whole-stage span).
  */
case class TokenCountCl100k(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_count_cl100k requires a string argument, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count_cl100k"

  override def nullSafeEval(input: Any): Any =
    TokenCountCl100k.count(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TokenCountCl100k.count($c.toString())")

  override protected def withNewChildInternal(
      newChild: Expression): TokenCountCl100k = copy(child = newChild)
}

object TokenCountCl100k {

  /** The cl100k_base pre-tokenizer split pattern, as published with the
    * tokenizer (the possessive form; branch order is significant):
    * contractions | optional-prefix letter runs | 1-3 digit runs |
    * punctuation runs (+ trailing newlines) | whitespace-to-newline |
    * trailing whitespace | other whitespace.
    * UNICODE_CHARACTER_CLASS makes Java's \s match Unicode whitespace
    * like the original.
    */
  private val SplitPattern: Pattern = Pattern.compile(
    """'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+""",
    Pattern.UNICODE_CHARACTER_CLASS)

  /** The real merges table, when supplied (`GRAFT_CL100K_RANKS` env,
    * `-Dgraft.cl100k.ranks`, or a `/cl100k_base.tiktoken` classpath
    * resource — see [[BpeRanks]]). With it, counts are bit-exact
    * cl100k_base; without (this zero-egress build), the per-piece
    * estimate below stands in. Loaded once per JVM, with the resolved
    * MODE logged once to stderr (ADVICE r8: the exact/estimate switch
    * is per-JVM environment, so a cluster where the driver resolves a
    * ranks file but an executor doesn't would silently mix
    * constant-folded exact counts with executor-estimated ones — the
    * log line is the audit trail, and [[validateEagerly]] turns a bad
    * path into a session-start failure instead of a mid-query one).
    */
  private lazy val ranks: Option[java.util.HashMap[String, Integer]] = {
    val r = BpeRanks.loadDefault()
    System.err.println(r match {
      case Some(t) =>
        s"graft: token_count_cl100k mode=EXACT (${t.size()} merge ranks, " +
          s"source=${BpeRanks.resolvedSource()})"
      case None =>
        "graft: token_count_cl100k mode=ESTIMATE (no ranks table: set " +
          "GRAFT_CL100K_RANKS / -Dgraft.cl100k.ranks or ship " +
          "/cl100k_base.tiktoken on the classpath for exact counts)"
    })
    r
  }

  /** Force ranks resolution NOW (called from GraftExtensions when a
    * session is built): an explicitly-configured-but-unreadable ranks
    * path throws here, at session start, not lazily inside the first
    * query that evaluates the expression.
    */
  def validateEagerly(): Unit = { ranks; () }

  /** Piece cost without a ranks table: 1 for anything up to 8 chars
    * (the overwhelmingly common case, matching the real BPE where
    * frequent words are single tokens), ceil(L/8) beyond (long/rare
    * pieces split in the real BPE; 8 chars/token is the conservative
    * end of published English BPE compression, so this under-counts
    * rather than inflates).
    */
  def count(s: String): Int = ranks match {
    case Some(r) => countExact(s, r)
    case None => countEstimate(s)
  }

  def countEstimate(s: String): Int = {
    if (s.isEmpty) return 0
    val m = SplitPattern.matcher(s)
    var tokens = 0
    while (m.find()) {
      val len = m.end() - m.start()
      tokens += math.max(1, (len + 7) / 8)
    }
    tokens
  }

  /** Exact two-stage count: published pre-tokenizer split, then the
    * tiktoken byte-pair merge per piece over `r` ([[BpeRanks.countPiece]]).
    */
  def countExact(s: String, r: java.util.HashMap[String, Integer]): Int = {
    if (s.isEmpty) return 0
    val m = SplitPattern.matcher(s)
    var tokens = 0
    while (m.find()) tokens += BpeRanks.countPiece(m.group(), r)
    tokens
  }
}
