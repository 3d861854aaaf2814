package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{TextAnalytics, TextOps}

/** The native RepCoverage expression (q198's kernel) must be
  * VALUE-IDENTICAL to the Scala kernel it replaced
  * ([[TextAnalytics.repCoverageOf]], retained as this cross-check) —
  * and therefore to the DuckDB explode+window oracle, which the full
  * oracle gate pins separately. Tiebreaks, code-point lengths, and
  * no-gram edge cases are the places a rewrite could drift.
  */
class RepCoverageSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val planted = Seq(
    "", // no words at all
    "one", // 1 word: no 2-grams
    "a b", // exactly one 2-gram, no 3-grams
    "a b c d", // 4 words: 2/3-grams but no 5-grams
    "a b a b a b a b", // dominant 2-gram with overlapping occurrences
    "x y z x y z x y z x y z x y z", // duplicated 5-grams, overlapping
    // count tie between "b a" and "a b": binary-smallest gram must win
    "a b a",
    // non-ASCII: code-point lengths != byte lengths, and the tiebreak
    // must compare UTF-8 bytes (é = 0xC3A9 sorts after ASCII)
    "café bar café bar café naïve Ωmega ωmega",
    "the the the the the the the the the the",
    // mixed-length words so gram char-lengths differ per position
    "aa b cccc dd e aa b cccc dd e aa b cccc dd e")

  test("native rep_coverage == the Scala kernel on planted edge shapes + corpus docs") {
    val corpus = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("text")).as[String].take(200).toSeq
    val kernel = udf(TextAnalytics.repCoverageOf _)
    val df = (planted ++ corpus).toDF("text")
      .select(
        graft.functions.rep_coverage(TextOps.wordsOf(col("text"))).as("n"),
        kernel(TextOps.wordsOf(col("text"))).as("k"))
    val mism = df.filter(
      col("n.top2_chars") =!= col("k.top2_chars") ||
      col("n.top3_chars") =!= col("k.top3_chars") ||
      col("n.dup5_chars") =!= col("k.dup5_chars")).count()
    assert(mism == 0, s"$mism docs diverged from the Scala kernel")
    // sanity on a known value: "a b a b a b a b" — "a b" occurs 4
    // overlapping times, 3 chars each
    val r = Seq("a b a b a b a b").toDF("text")
      .select(graft.functions.rep_coverage(TextOps.wordsOf(col("text"))).as("c"))
      .selectExpr("c.top2_chars", "c.top3_chars", "c.dup5_chars").head()
    assert(r.getLong(0) == 12L)
  }

  test("q198 battery plan is UDF-free (VERDICT r14 #3)") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val plan = TextAnalytics.repetitionBattery(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      s"q198 plan still carries a UDF:\n$plan")
    assert(plan.contains("rep_coverage"))
  }

  test("null words array yields null struct (battery coalesces fields to 0)") {
    val out = Seq(Tuple1[Seq[String]](null), Tuple1(Seq("a", "b")))
      .toDF("ws").select(graft.functions.rep_coverage(col("ws")).as("c"))
      .collect()
    assert(out.count(_.isNullAt(0)) == 1)
  }
}
