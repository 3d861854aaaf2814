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

  test("q209 phash equals a sequential recompute; re-encoded copies pair, " +
    "unrelated blobs don't") {
    import graft.queries.Multimodal
    val c = Multimodal.PHashCells
    // sequential twin of mediaPhash on raw UTF-8 bytes
    def phashOf(text: String): Long = {
      val bytes = text.getBytes("UTF-8").map(b => (b & 0xff).toLong)
      val n = bytes.length.toLong
      require(n >= c)
      val cells = (0 until c).map { k =>
        val lo = math.floor(k * n / c.toDouble).toLong.toInt
        val hi = math.floor((k + 1) * n / c.toDouble).toLong.toInt
        bytes.slice(lo, hi).sum
      }
      val total = cells.sum
      (0 until c).foldLeft(0L) { (acc, k) =>
        if (cells(k) * c > total) acc | (1L << k) else acc
      }
    }
    val base = ("the quick brown fox jumps over the lazy dog " * 4).trim
    val corrupt = base.updated(10, 'X').updated(90, 'Y') // a "re-encode"
    // NOT a periodic repeat: a repeating pattern's cell sums are
    // near-uniform like the base's, and two near-uniform signatures
    // can land within the Hamming bar by construction
    val other = "Seventeen quiet librarians catalogued obscure " +
      "manuscripts beneath flickering halogen lamps while rain hammered " +
      "the museum roof and distant thunder rolled across the valley " +
      "floor for hours on end"
    val docs = Seq(1L -> base, 2L -> base, 3L -> corrupt, 4L -> other,
      5L -> "short").toDF("doc_id", "text")
    val got = Multimodal.mediaPhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phash")).toMap
    // blobs below the grid size carry no signature
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    for ((id, t) <- Seq(1L -> base, 2L -> base, 3L -> corrupt, 4L -> other))
      assert(got(id) == phashOf(t), s"doc $id phash diverged")
    // fixture pairing through the FULL band+verify pipeline: identical
    // blobs at hamming 0, the corrupted copy within the bar, the
    // unrelated blob absent
    val pairs = Multimodal.phashNeardup(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("hamming")).toMap
    assert(pairs((1L, 2L)) == 0L)
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      s"re-encoded copy must pair with both originals: $pairs")
    assert(pairs((1L, 3L)) <= Multimodal.PHashMaxHam)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated blob must not pair")
    assert(java.lang.Long.bitCount(got(1L) ^ got(4L)) >
      Multimodal.PHashMaxHam)
    graft.pipeline.Chunker.clearCaches()
  }
}
