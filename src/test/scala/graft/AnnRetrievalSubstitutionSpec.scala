package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Similarity, TextAnalytics}

/** VERDICT r9 #6 — extend the measured-ANN-substitution evidence from
  * mining (AnnSubstitutionSpec / q168) to the RETRIEVAL arms: q161's
  * RRF fusion and q169's agreement eval score an exact O(N·Q) dense
  * arm; at 100 TB that arm is served by an ANN index. This spec swaps
  * the q52 multi-probe LSH family into the fusion via
  * [[TextAnalytics.rrfFuseWith]]/[[TextAnalytics.rrfDenseAnn]] (same
  * output contract, candidates confined to probed buckets) on the real
  * sf0.001 corpus and MEASURES what the substitution costs end-to-end:
  *
  *  - dense-arm recall\@RrfN (how much of the exact top-50 the probed
  *    buckets recover),
  *  - fused-list nDCG\@10 against the exact fusion as truth (graded
  *    relevance (k+1-rank)/log2, the q197 formula),
  *  - fused-list overlap\@k at the q169 cut depths,
  *  - the q197 arm-level eval itself at fixture-sized signature width.
  *
  * The corpus and hyperplanes are deterministic, so the floors are
  * stable pins, not flaky estimates. Signature width follows the
  * fixture sizing rule documented in AnnSubstitutionSpec (bits ~
  * log2(N / bucket) → 3 bits at 500 vectors; the catalog's Q52Bits=10
  * targets sf0.1).
  */
class AnnRetrievalSubstitutionSpec extends AnyFunSuite with CacheCleanup {
  import TestSpark.spark

  private val SfDir = "/root/testdata/sf0.001"
  private val Bits = 3

  /** Fused table → ordered doc list (rrf_score desc, doc_id asc — the
    * serving order of a fused retriever).
    */
  private def ranking(df: DataFrame): Seq[Long] =
    df.orderBy(col("rrf_score").desc, col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq

  private lazy val denseExact =
    TextAnalytics.rrfDenseExact(spark, SfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
  private lazy val denseAnn =
    TextAnalytics.rrfDenseAnn(spark, SfDir, Bits)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  private lazy val fusedExact = ranking(TextAnalytics.rrfFuseWith(
    spark, SfDir, TextAnalytics.rrfDenseExact(spark, SfDir)))
  private lazy val fusedAnn = ranking(TextAnalytics.rrfFuseWith(
    spark, SfDir, TextAnalytics.rrfDenseAnn(spark, SfDir, Bits)))

  /** nDCG\@k of `run` against `truth` with the q197 graded-relevance
    * formula: gain (k+1-truth_rank), discount log2(run_rank+1).
    */
  private def ndcgAt(k: Int, truth: Seq[Long], run: Seq[Long]): Double = {
    val tRank = truth.take(k).zipWithIndex
      .map { case (d, i) => d -> (i + 1) }.toMap
    val dcg = run.take(k).zipWithIndex.map { case (d, i) =>
      tRank.get(d).map(t =>
        (k + 1 - t).toDouble / (math.log(i + 2) / math.log(2)))
        .getOrElse(0.0)
    }.sum
    val idcg = (1 to k).map(t =>
      (k + 1 - t).toDouble / (math.log(t + 1) / math.log(2))).sum
    dcg / idcg
  }

  test("dense-arm recall@RrfN under the multi-probe substitution") {
    assert(denseExact.size == TextAnalytics.RrfN)
    val recall = (denseExact intersect denseAnn).size.toDouble / denseExact.size
    info(f"dense-arm recall@${TextAnalytics.RrfN}: $recall%.3f " +
      s"(${denseAnn.size} ANN candidates)")
    assert(denseAnn.nonEmpty, "probed buckets returned no dense candidates")
    assert(recall >= 0.7, f"dense recall $recall%.3f below pin (measured 0.740)")
  }

  test("fused nDCG@10 and overlap@k vs the exact fusion, measured") {
    val n10 = ndcgAt(10, fusedExact, fusedAnn)
    val overlaps = Seq(5, 10, 25, 50).map(k =>
      k -> (fusedExact.take(k).toSet intersect fusedAnn.take(k).toSet)
        .size.toDouble / k)
    info(f"fused nDCG@10 = $n10%.3f; overlap@k = " +
      overlaps.map { case (k, o) => f"$k:$o%.2f" }.mkString(", "))
    // the sparse arm is identical in both fusions, so fusion damps the
    // dense arm's recall loss — the fused list must stay materially
    // closer to exact than the raw dense arm does
    assert(n10 >= 0.85, f"fused nDCG@10 $n10%.3f below pin (measured 0.928)")
    assert(overlaps.head._2 >= 0.6,
      f"fused overlap@5 ${overlaps.head._2}%.2f below pin")
  }

  test("q197's own arm-level eval at fixture signature width") {
    val arm = Similarity.annNdcg(
        Tables.embeddings(spark, SfDir), Similarity.NdcgK, Bits)
      .agg(avg(col("ndcg_at_10")).as("m"), count(lit(1)).as("n"))
      .head()
    val mean = arm.getAs[Double]("m"); val n = arm.getAs[Long]("n")
    info(f"mean arm nDCG@10 over $n queries = $mean%.3f")
    assert(n > 0 && mean >= 0.7, // measured 0.770
      f"arm-level nDCG@10 $mean%.3f below pin over $n queries")
  }
}
