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

  test("media shards: greedy byte-budget boundaries are exact and " +
    "id ranges are contiguous") {
    // the q144 characterization at byte granularity: cumulative bytes
    // through shard b must land in (b*B, (b+1)*B], and the id ranges
    // of consecutive shards must chain without gap or overlap
    val out = SparkEntry
      .queries("q155_media_shards")(TestSpark.spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_items"),
        r.getAs[Long]("shard_bytes"), r.getAs[Long]("first_id"),
        r.getAs[Long]("last_id")))
      .sortBy(_._1)
    assert(out.length > 1, "fixture must span multiple shards")
    assert(out.map(_._1).toSeq == (0L until out.length))
    val b = graft.queries.Multimodal.MediaShardBytes
    var cum = 0L
    out.dropRight(1).foreach { case (shard, _, bytes, _, _) =>
      cum += bytes
      assert(cum > shard * b && cum <= (shard + 1) * b,
        s"shard $shard boundary broke the greedy invariant")
    }
    out.sliding(2).foreach { case Array(a, c) =>
      assert(a._5 < c._4, "shard id ranges must chain in order")
    }
    assert(out.forall(_._2 > 0))
  }
}
