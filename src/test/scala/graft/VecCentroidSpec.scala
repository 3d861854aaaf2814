package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.aggregates.VecCentroid

/** The typed centroid Aggregator (UDAF surface): mean correctness
  * across partitions, null-row skipping, empty-group result, and the
  * ragged-input guard.
  */
class VecCentroidSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val centroid = udaf(VecCentroid)

  test("centroid equals the element-wise mean across many partitions") {
    // 97 vectors spread over 8 partitions: v_k = (k, 2k, -k)
    val n = 97
    val df = (0 until n).map(k => (k % 3, Array(k.toFloat, 2f * k, -k.toFloat)))
      .toDF("g", "emb").repartition(8)
    val got = df.groupBy($"g").agg(centroid($"emb").as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    for (g <- 0 until 3) {
      val ks = (0 until n).filter(_ % 3 == g)
      val mean = ks.map(_.toDouble).sum / ks.size
      val c = got(g)
      assert(math.abs(c(0) - mean) < 1e-9)
      assert(math.abs(c(1) - 2 * mean) < 1e-9)
      assert(math.abs(c(2) + mean) < 1e-9)
    }
  }

  test("null vectors are skipped, not averaged as zeros") {
    val df = Seq((1, Array(2f, 4f)), (1, null.asInstanceOf[Array[Float]]),
      (1, Array(4f, 8f))).toDF("g", "emb")
    val c = df.groupBy($"g").agg(centroid($"emb").as("c"))
      .head().getSeq[Double](1)
    assert(c == Seq(3.0, 6.0))
  }

  test("all-null group yields an empty centroid") {
    val df = Seq((1, null.asInstanceOf[Array[Float]]),
      (1, null.asInstanceOf[Array[Float]])).toDF("g", "emb")
    val c = df.groupBy($"g").agg(centroid($"emb").as("c"))
      .head().getSeq[Double](1)
    assert(c.isEmpty)
  }

  test("ragged vectors fail loudly instead of silently truncating") {
    val df = Seq((1, Array(1f, 2f)), (1, Array(1f, 2f, 3f))).toDF("g", "emb")
    val e = intercept[org.apache.spark.SparkException] {
      df.groupBy($"g").agg(centroid($"emb").as("c")).collect()
    }
    assert(e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")))
  }
}
