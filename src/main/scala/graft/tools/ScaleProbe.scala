package graft.tools

import org.apache.spark.sql.SparkSession

/** Empirical scale probe (VERDICT r7 #5): run the dedup/ANN headliners
  * once at sf0.1 and once on the [[ScaleGen]] N× corpus, and record
  * measured wall-time ratios in `SCALE.md` — turning the catalog's
  * "linear by construction" claims (bucket caps, prefix filters,
  * sublinear centroid sets) into an observed data point.
  *
  * Method mirrors `graft.Bench`: warmup pass at sf0.001, caches cleared
  * before every timed pass, noop-sink materialization, per-query MIN of
  * `passes` (min, not median — the probe asks "what does the plan cost",
  * and the occasional GC pause is noise the ratio must not absorb).
  */
object ScaleProbe {

  val Headliners: Seq[String] = Seq(
    "q41_dedup_near", "q151_prefix_join", "q160_semdedup",
    "q62_ann_ivf", "q190_ivfpq_serving")

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val bigDir = if (args.length > 1) args(1) else "/root/repo/scaleprobe/x10"
    val factor = if (args.length > 2) args(2).toInt else 10
    val outMd = if (args.length > 3) args(3) else "/root/repo/SCALE.md"
    val passes = 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def clearAll(): Unit = {
      graft.pipeline.Chunker.clearCaches()
      spark.catalog.clearCache()
    }

    Headliners.foreach(n =>
      try materialize(graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case scala.util.control.NonFatal(_) => () })

    def time(dir: String): Map[String, Double] =
      (1 to passes).map { _ =>
        clearAll()
        Headliners.map { n =>
          val t0 = System.nanoTime()
          materialize(graft.SparkEntry.queries(n)(spark, dir))
          n -> (System.nanoTime() - t0) / 1e9
        }.toMap
      }.reduce((a, b) => a.map { case (k, v) => k -> math.min(v, b(k)) })

    val base = time(baseDir)
    val big = time(bigDir)
    spark.stop()

    val rows = Headliners.map { n =>
      f"| $n | ${base(n)}%.2f | ${big(n)}%.2f | ${big(n) / base(n)}%.1f× |"
    }
    val md =
      s"""# SCALE — measured wall-time scaling of the dedup/ANN headliners
         |
         |`graft.tools.ScaleGen` synthesizes a ${factor}× documents+embeddings
         |corpus from sf0.1 (deterministic word-permuted / noise-perturbed
         |replicas that preserve the source's duplicate RATE instead of
         |making every replica a near-dup of its original — see the
         |ScaleGen scaladoc), and `graft.tools.ScaleProbe` times each
         |headliner on both corpora (min of $passes cache-cleared passes,
         |noop sink, local[32]). Reproduce with:
         |
         |```
         |sbt "runMain graft.tools.ScaleGen /root/testdata/sf0.1 /root/repo/scaleprobe/x$factor $factor"
         |sbt "runMain graft.tools.ScaleProbe /root/testdata/sf0.1 /root/repo/scaleprobe/x$factor $factor"
         |```
         |
         || query | sf0.1 (s) | ${factor}× (s) | ratio |
         ||---|---|---|---|
         |${rows.mkString("\n")}
         |
         |Input scale: documents ×$factor rows, embeddings ×$factor rows.
         |A ratio ≲ ${factor}× (plus constant overheads at the small end)
         |is the linearity the 100-TB designs claim: banded LSH with
         |bucket caps (q41), df-ordered prefix filtering (q151),
         |k-means-blocked SemDeDup (q160), √N-centroid IVF (q62), and
         |IVF-PQ ADC serving (q190) all avoid any N² stage, so wall time
         |should track corpus size ~linearly with a sublinear extra for
         |the √N centroid stages.
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(outMd),
      md.getBytes("UTF-8"))
    println(md)
  }
}
