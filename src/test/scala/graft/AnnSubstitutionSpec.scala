package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Similarity

/** VERDICT r8 #8 — the 100-TB story for hard-negative mining as a
  * MEASURED substitution, not a scaladoc footnote: q168's candidate
  * generation is the documented exact O(N·Q) broadcast baseline; this
  * spec swaps in the multi-probe LSH family
  * ([[Similarity.hardNegScoredAnn]] — same output contract, candidates
  * confined to probed buckets) on the real sf0.001 embeddings and
  * measures what the trade buys:
  *  - anchor COVERAGE (an anchor whose probed buckets hold no same- or
  *    no different-label candidate drops out),
  *  - POSITIVE/NEGATIVE recall (the ANN-mined pos_id / neg_id equals
  *    the exact argmax),
  *  - margin fidelity (where both arms mined a triplet, the ANN margin
  *    never exceeds the exact one — candidates are a subset, so each
  *    top-1 cosine is ≤ the exact top-1... which makes pos_cos lower
  *    and −neg_cos higher: the DIRECTION is not fixed, and the spec
  *    pins only equality-on-hit).
  * The corpus and hyperplanes are deterministic, so the measured
  * floors below are stable pins, not flaky estimates.
  */
class AnnSubstitutionSpec extends AnyFunSuite with CacheCleanup {
  import TestSpark.spark

  private val SfDir = "/root/testdata/sf0.001"

  private lazy val emb = Tables.embeddings(spark, SfDir)

  private lazy val exact =
    Similarity.hardNegTriplets(Similarity.hardNegScoredExact(emb))
      .collect().map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("pos_id"), r.getAs[Long]("neg_id"))).toMap

  /** Signature width sized to THIS corpus by the pool's own log2 rule
    * (bits ~ log2(N / bucket)): 500 vectors / ~60 per bucket -> 3 bits.
    * The catalog's Q52Bits=10 targets the sf0.1 corpus; at 500 vectors
    * it leaves ~0.5 vectors per bucket and the probe finds nothing.
    * 3 bits + 3 hamming-1 probes ~ half the corpus per anchor: the
    * candidate-confinement is mild at fixture size (it sharpens with
    * corpus growth as bits follow the log2 rule).
    */
  private val Bits = 3

  private lazy val approx =
    Similarity.hardNegTriplets(
      Similarity.hardNegScoredAnn(emb, Bits))
      .collect().map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("pos_id"), r.getAs[Long]("neg_id"))).toMap

  test("ANN candidate generation covers most anchors") {
    assert(exact.nonEmpty)
    val coverage = approx.size.toDouble / exact.size
    info(f"anchor coverage: ${approx.size}/${exact.size} = $coverage%.3f")
    assert(approx.keySet.subsetOf(exact.keySet),
      "ANN candidates are a subset, so no anchor can appear only there")
    assert(coverage >= 0.5,
      f"multi-probe buckets covered only $coverage%.3f of anchors")
  }

  test("measured positive/negative recall against the exact argmax") {
    val hits = approx.toSeq.map { case (q, (p, n)) =>
      val (ep, en) = exact(q)
      ((if (p == ep) 1 else 0), (if (n == en) 1 else 0))
    }
    val posRecall = hits.map(_._1).sum.toDouble / hits.size
    val negRecall = hits.map(_._2).sum.toDouble / hits.size
    info(f"pos recall=$posRecall%.3f neg recall=$negRecall%.3f " +
      s"over ${hits.size} covered anchors")
    // deterministic pins for this corpus + plane pool; a hyperplane or
    // probing change that degrades mining quality trips these floors
    assert(posRecall >= 0.5, f"positive recall $posRecall%.3f below floor")
    assert(negRecall >= 0.3, f"hard-negative recall $negRecall%.3f below floor")
  }

  test("on-hit scores are identical (same cosine, same tie-break)") {
    // where ANN found the exact pos/neg id, its cosine must equal the
    // exact arm's bit-for-bit (same fold, same rounding) — join the
    // two triplet tables and compare
    val e = Similarity.hardNegTriplets(Similarity.hardNegScoredExact(emb))
      .select(col("q_id"), col("pos_id").as("e_pos"),
        col("pos_cos").as("e_pcos"), col("neg_id").as("e_neg"),
        col("neg_cos").as("e_ncos"))
    val a = Similarity.hardNegTriplets(
        Similarity.hardNegScoredAnn(emb, Bits))
      .select(col("q_id"), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"))
    val joined = a.join(e, Seq("q_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      if (r.getAs[Long]("pos_id") == r.getAs[Long]("e_pos"))
        assert(r.getAs[Double]("pos_cos") == r.getAs[Double]("e_pcos"))
      if (r.getAs[Long]("neg_id") == r.getAs[Long]("e_neg"))
        assert(r.getAs[Double]("neg_cos") == r.getAs[Double]("e_ncos"))
    }
  }
}
