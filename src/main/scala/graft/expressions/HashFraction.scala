package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's canonical deterministic uniform — sha256-derived
  * fraction in [0, 1) — as ONE native codegen'd expression.
  *
  * Semantics are EXACTLY `TextAnalytics.hashFraction`'s column formula
  * (first 8 hex chars of sha256 decoded as a 32-bit integer, divided by
  * 2^32 — an exact power-of-two division), which every deterministic
  * sampler (q64/q99/q105/q149), the k-means seeding/membership
  * (q139/q142), the IVF centroid sample (q62/q140), and the count-min
  * buckets (q148) compare against the DuckDB mirror
  * `TextAnalytics.hashFractionSql`. The column formula materializes
  * EIGHT `sha2` + `substring` + `ascii` subtrees per row and relies on
  * codegen CSE to collapse them; this expression computes the digest
  * once and reads its first four bytes directly — same value, one
  * digest, no intermediate hex string at all.
  *
  * `HashFractionSpec` pins value-equality against the original column
  * formula on planted and arbitrary strings, so the two surfaces cannot
  * drift; the SQL oracle side is untouched.
  */
case class HashFraction(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash_fraction requires a string argument, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hash_fraction"

  override def nullSafeEval(input: Any): Any =
    HashFraction.fraction(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashFraction.fraction($c)")

  override protected def withNewChildInternal(newChild: Expression): HashFraction =
    copy(child = newChild)
}

object HashFraction {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("SHA-256")
  }

  /** Called from both interpreted eval and generated code. The first 8
    * HEX characters of the digest are exactly its first 4 BYTES, read
    * big-endian as an unsigned 32-bit value.
    */
  def fraction(s: UTF8String): Double = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v.toDouble / 4294967296.0
  }
}
