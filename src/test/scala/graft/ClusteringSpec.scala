package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Clustering, TextAnalytics}

/** Behavioral proof for the Lloyd k-means: on a planted 3-cluster
  * fixture whose cluster CENTERS are placed on the three ids the hash
  * seeding will pick (computed from the same hashFraction the operator
  * uses), the recovered partition must equal the planted one exactly.
  * The sf0.01 oracle (q139) proves engine parity; this proves the
  * operator actually clusters.
  */
class ClusteringSpec extends AnyFunSuite with CacheCleanup {
  import TestSpark.spark
  import spark.implicits._

  private val centers = Seq(
    Array(10f, 0f, 0f, 0f),
    Array(0f, 10f, 0f, 0f),
    Array(0f, 0f, 10f, 0f))

  test("kmeans recovers planted clusters when each gets a seed") {
    val ids = (1L to 30L)
    // the operator seeds from the K smallest hashFraction(vec_id) —
    // compute that order with the SAME expression and put one planted
    // center on each of the three ids that will be chosen
    val seedIds = ids.toDF("vec_id")
      .select(col("vec_id"),
        TextAnalytics.hashFraction(col("vec_id")).as("hf"))
      .orderBy(col("hf"), col("vec_id"))
      .limit(3).collect().map(_.getLong(0)).toSeq
    val rest = ids.filterNot(seedIds.contains)
    val planted: Map[Long, Int] =
      seedIds.zipWithIndex.toMap ++
        rest.zipWithIndex.map { case (id, i) => id -> (i % 3) }.toMap
    val emb = ids.map { id =>
      val c = centers(planted(id))
      val noisy =
        if (seedIds.contains(id)) c // seeds sit exactly on the centers
        else c.zipWithIndex.map { case (v, j) =>
          v + 0.01f * ((id + j) % 5) }
      (id, noisy)
    }.toDF("vec_id", "embedding")

    val out = Clustering.kmeans(emb, k = 3, iters = 3).collect()
    assert(out.length == 30)
    val byId = out.map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    // every point must carry the seed id of ITS planted cluster
    ids.foreach { id =>
      val expected = seedIds(planted(id))
      assert(byId(id) == expected,
        s"vec $id: planted cluster ${planted(id)} (seed $expected), " +
          s"got ${byId(id)}")
    }
    // distances of the noisy points are small but non-zero
    assert(out.filter(r => !seedIds.contains(r.getAs[Long]("vec_id")))
      .forall(_.getAs[Double]("dist_sq") < 1.0))
  }

  test("semDeDup removes exactly the worse-ranked copy of planted duplicates") {
    // three noisy points around one center, two around another, plus
    // EXACT copies of ids 2 and 5 under larger ids. At tau = 1.0 only
    // pairs whose ROUNDED cosine is 1.0 can dedup — the planted copies
    // (identical vectors) qualify; the merely-nearby points round to
    // 0.99999x and never do. The assertion therefore holds for ANY
    // cluster arrangement (identical vectors always land in the same
    // cluster with the same dist_sq, so the tie falls to min vec_id).
    val base = Map(
      1L -> Array(10f, 0f, 0.1f, 0f),
      2L -> Array(10f, 0.2f, 0f, 0f),
      3L -> Array(10f, 0f, 0f, 0.3f),
      4L -> Array(0f, 10f, 0.1f, 0f),
      5L -> Array(0f, 10f, 0f, 0.2f))
    val emb = (base.toSeq ++ Seq(
      101L -> base(2L), 102L -> base(5L))).toDF("vec_id", "embedding")
    val out = Clustering.semDeDup(emb, k = 2, iters = 2, tau = 1.0)
      .collect().map(r =>
        r.getAs[Long]("vec_id") -> r.getAs[Long]("kept")).toMap
    assert(out.size == 7)
    assert(out.filter(_._2 == 0L).keySet == Set(101L, 102L),
      s"expected exactly the planted copies removed: $out")
    // copies share their original's cluster (identical assignment)
    val clusters = Clustering.semDeDup(emb, 2, 2, 1.0)
      .collect().map(r =>
        r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    assert(clusters(101L) == clusters(2L) && clusters(102L) == clusters(5L))
  }

  test("cluster sample: big clusters capped near target, small kept whole") {
    // cluster 1: 100 members, cluster 2: 5 members, target 20
    val assigned = ((1L to 100L).map(i => (i, 1L)) ++
      (200L to 204L).map(i => (i, 2L))).toDF("vec_id", "cluster")
    val out = Clustering.clusterSample(assigned, 20L).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster")))
    val byCluster = out.groupBy(_._2).view.mapValues(_.length).toMap
    // rate 1.0 keeps every member (hashFraction < 1 always)
    assert(byCluster(2L) == 5, s"small cluster must survive whole: $byCluster")
    // rate 0.2 on 100 members: hash-binomial around 20, never the whole
    // cluster; exact count is deterministic forever
    assert(byCluster(1L) > 5 && byCluster(1L) < 50, byCluster.toString)
    // determinism: the same call yields the same sample
    val again = Clustering.clusterSample(assigned, 20L).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster")))
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("lloyd iterations never increase total within-cluster SSE") {
    val ids = (1L to 30L)
    val emb = ids.map { id =>
      val c = centers((id % 3).toInt)
      (id, c.zipWithIndex.map { case (v, j) => v + 0.3f * ((id + j) % 7) })
    }.toDF("vec_id", "embedding")
    val e = emb.select(col("vec_id"), col("embedding"))
    def sse(cents: org.apache.spark.sql.DataFrame): Double =
      Clustering.assign(e, cents)
        .agg(sum(col("dist_sq"))).collect()(0).getDouble(0)
    var cents = Clustering.seedCentroids(e, 3)
    var prev = sse(cents)
    for (_ <- 1 to 3) {
      cents = Clustering.recentroid(Clustering.assign(e, cents))
      val cur = sse(cents)
      // 1e-6 slack: distances/centroids are rounded to 6 decimals
      assert(cur <= prev + 1e-5, s"SSE rose: $prev -> $cur")
      prev = cur
    }
  }

  test("q181 PQ recovers all pattern COMBINATIONS with only k centroids per subspace") {
    // The property PQ exists for: the codebook is the CARTESIAN PRODUCT
    // of per-subspace codebooks, so 2 centroids per subspace represent
    // 4 distinct vector families — a plain kmeans with 2 centers can't.
    // 8-dim vectors, m=2 subspaces of 4: subspace 0 carries pattern A or
    // B, subspace 1 carries C or D; all four combos are planted. The
    // seeds (the 2 smallest-hash ids, same ids for every subspace) are
    // placed on combos (A,C) and (B,D), so each subspace starts with
    // both of ITS patterns seeded, and the un-seeded combos (A,D) and
    // (B,C) must still be coded exactly — by mixing sub-codes.
    val a = Array(10f, 0f, 0f, 0f); val b = Array(0f, 10f, 0f, 0f)
    val c = Array(0f, 0f, 10f, 0f); val dd = Array(0f, 0f, 0f, 10f)
    val ids = (1L to 24L)
    val seedIds = ids.toDF("vec_id")
      .select(col("vec_id"),
        TextAnalytics.hashFraction(col("vec_id")).as("hf"))
      .orderBy(col("hf"), col("vec_id"))
      .limit(2).collect().map(_.getLong(0)).toSeq
    val combos = Seq((a, c), (b, dd), (a, dd), (b, c))
    val rest = ids.filterNot(seedIds.contains)
    val planted: Map[Long, Int] =
      Map(seedIds.head -> 0, seedIds(1) -> 1) ++
        rest.zipWithIndex.map { case (id, i) => id -> (i % 4) }.toMap
    val emb = ids.map { id =>
      val (p0, p1) = combos(planted(id))
      val v = p0 ++ p1
      val noisy = if (seedIds.contains(id)) v
        else v.zipWithIndex.map { case (x, j) => x + 0.01f * ((id + j) % 3) }
      (id, noisy)
    }.toDF("vec_id", "embedding")
    val out = Clustering.productQuantize(emb, m = 2, k = 2, iters = 2, dim = 8)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("code0"), r.getAs[Long]("code1")),
          r.getAs[Double]("err_total"))).toMap
    assert(out.size == 24)
    // same planted combo -> same code pair; all four combos distinct
    val codeOf: Map[Int, (Long, Long)] =
      (0 until 4).map(cb => cb ->
        out(planted.collectFirst { case (id, `cb`) => id }.get)._1).toMap
    assert(codeOf.values.toSet.size == 4, s"4 combos must get 4 codes: $codeOf")
    planted.foreach { case (id, cb) =>
      assert(out(id)._1 == codeOf(cb), s"vec $id combo $cb coded ${out(id)._1}")
    }
    // sub-code SHARING across combos: (A,C) and (A,D) share code0 but
    // not code1 — the cartesian structure itself
    assert(codeOf(0)._1 == codeOf(2)._1 && codeOf(1)._1 == codeOf(3)._1)
    assert(codeOf(0)._2 == codeOf(3)._2 && codeOf(1)._2 == codeOf(2)._2)
    // reconstruction error is the planted noise, never a pattern miss
    assert(out.values.forall(_._2 < 1.0),
      s"err_total should be noise-scale: ${out.values.map(_._2).max}")
  }

  test("q189 silhouette is near 1 on separated clusters, degrades when merged") {
    // same planted-3-cluster recipe as the kmeans test: tight noise
    // around three orthogonal centers -> own-centroid distance tiny,
    // other-centroid distance huge -> silhouette ~ 1 everywhere
    val ids = (1L to 30L)
    val emb = ids.map { id =>
      val c = centers((id % 3).toInt)
      (id, c.zipWithIndex.map { case (v, j) => v + 0.01f * ((id + j) % 5) })
    }.toDF("vec_id", "embedding")
    val out = Clustering.clusterSilhouette(emb, k = 3, iters = 3)
      .collect().map(r => (r.getAs[Long]("n"), r.getAs[Double]("mean_silhouette")))
    assert(out.map(_._1).sum == 30)
    assert(out.forall(_._2 > 0.9),
      s"separated clusters must score near 1: ${out.toSeq}")
    // overlapping data (all points around ONE center, split across
    // k=3 seeds) cannot score like separated data
    val blob = ids.map { id =>
      (id, centers(0).zipWithIndex.map { case (v, j) =>
        v + 0.3f * ((id * 7 + j * 3) % 11 - 5) })
    }.toDF("vec_id", "embedding")
    val blobOut = Clustering.clusterSilhouette(blob, k = 3, iters = 3)
      .collect().map(_.getAs[Double]("mean_silhouette"))
    assert(blobOut.min < 0.9,
      s"an overlapping blob should not silhouette like separated clusters: ${blobOut.toSeq}")
  }
}
