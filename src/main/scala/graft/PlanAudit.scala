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
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
