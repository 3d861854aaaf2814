package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Similarity

/** Behavioral checks on planted vectors (the catalog queries are
  * oracle-locked; these document the semantics).
  */
class SimilaritySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val v = Array.tabulate(64)(i => (math.sin(i + 1)).toFloat)
  private val w = Array.tabulate(64)(i => (math.cos(i * 3 + 2)).toFloat)

  test("cosine: exact duplicates score 1.0; self-consistency of norms") {
    val df = Seq((1L, v.toSeq), (2L, v.toSeq), (3L, w.toSeq))
      .toDF("id", "emb")
    val pair = df.as("a").crossJoin(df.as("b"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        Similarity.cosine(col("a.emb"), col("b.emb")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pair((1L, 2L)) == 1.0)
    assert(pair((1L, 1L)) == 1.0)
    assert(math.abs(pair((1L, 3L))) < 1.0)
  }

  test("duplicate vectors share the ANN signature bucket (always found)") {
    val df = Seq((1L, v.toSeq), (2L, v.toSeq), (3L, w.toSeq))
      .toDF("id", "emb")
    val sigs = df.select(col("id"),
      Similarity.bandSignature(col("emb"), 4, 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sigs(1L) == sigs(2L),
      "identical vectors must always land in the same bucket")
    assert(sigs(1L).length == 4 && sigs(1L).forall(c => c == '0' || c == '1'))
  }

  test("ANN results agree with brute force on shared pairs (sf0.001)") {
    val d = TestSpark.sf0001
    val brute = graft.queries.Similarity.queries("q38_cosine_topk")(spark, d)
      .select(col("q_id"), col("neighbor_id"), col("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ann = graft.queries.Similarity.queries("q39_ann_buckets")(spark, d)
      .select(col("q_id"), col("neighbor_id"), col("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ann.nonEmpty)
    // wherever ANN and brute force surface the same pair, the cosine is
    // IDENTICAL (same expression, same fold)
    val shared = ann.keySet.intersect(brute.keySet)
    assert(shared.nonEmpty)
    shared.foreach(k => assert(ann(k) == brute(k)))
  }
}
