package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{BinaryMedia, MediaRecord}

class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("media table carries opaque blob + typed prunable metadata") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val media = BinaryMedia.mediaTable(docs, "doc_id", "text")
    val schema = media.schema
    assert(schema("media").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val row = media.orderBy("id").limit(1).collect()(0)
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[String]("format") == "text/plain")
    assert(meta.getAs[Int]("n_bytes") ==
      row.getAs[Array[Byte]]("media").length)
  }

  test("feature extraction: distributed, deterministic, batch-shaped") {
    val recs = (0L until 100L).map(i =>
      MediaRecord(i, s"payload number $i with bytes ${"x" * i.toInt}".getBytes("UTF-8"), "text/plain"))
    val ds = recs.toDS().repartition(4)
    val out = BinaryMedia.extractFeatures(ds, dim = 16).collect()
      .sortBy(_.id)
    assert(out.length == 100)
    // schema/shape: fixed-dim float vector, byte count preserved
    out.foreach { f =>
      assert(f.features.length == 16)
      assert(f.nBytes == recs(f.id.toInt).media.length)
      // L1-normalized histogram sums to ~1
      assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-5)
    }
    // deterministic across runs and partitionings
    val again = BinaryMedia.extractFeatures(ds.repartition(7), dim = 16)
      .collect().sortBy(_.id)
    assert(out.zip(again).forall { case (a, b) =>
      a.features.sameElements(b.features) })
  }

  test("decode stub batches exactly like an inference client") {
    val recs = (0L until 70L).map(i => MediaRecord(i, Array[Byte](i.toByte), "b"))
    // grouped(32) on 70 records -> batches of 32, 32, 6
    val sizes = recs.grouped(BinaryMedia.DecodeBatchSize).map(_.size).toSeq
    assert(sizes == Seq(32, 32, 6))
    val feats = BinaryMedia.decodeStub(recs, dim = 8)
    assert(feats.map(_.id) == recs.map(_.id))
  }
}
