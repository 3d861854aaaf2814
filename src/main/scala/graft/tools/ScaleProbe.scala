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
    "q62_ann_ivf", "q190_ivfpq_serving",
    "q130_minhash_estimate", "q179_containment_dedup")

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val bigDir = if (args.length > 1) args(1) else "/root/repo/scaleprobe/x10"
    val factor = if (args.length > 2) args(2).toInt else 10
    val outMd = if (args.length > 3) args(3) else "/root/repo/SCALE.md"
    val passes = sys.env.getOrElse("SPARK_GRAFT_SCALE_PASSES", "2").toInt
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

    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = Headliners.filter(n => only.forall(_.exists(n.startsWith)))

    names.foreach(n =>
      try materialize(graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case scala.util.control.NonFatal(_) => () })

    // a per-query failure (e.g. a disk-filling spill) must not lose the
    // other measurements — record it as NaN and keep probing
    def time(dir: String): Map[String, Double] =
      (1 to passes).map { p =>
        clearAll()
        names.map { n =>
          val t0 = System.nanoTime()
          val sec = try {
            materialize(graft.SparkEntry.queries(n)(spark, dir))
            (System.nanoTime() - t0) / 1e9
          } catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"SCALEPROBE FAIL $n @ $dir: " +
                String.valueOf(e.getMessage).take(200))
              Double.NaN
          }
          System.err.println(f"SCALEPROBE $dir pass $p $n ${sec}%.2f s")
          n -> sec
        }.toMap
      }.reduce((a, b) => a.map { case (k, v) =>
        k -> (if (v.isNaN) b(k)
              else if (b(k).isNaN) v
              else math.min(v, b(k))) })

    val base = time(baseDir)
    val big = time(bigDir)
    spark.stop()

    // the table is composed OUTSIDE the stripMargin templates: markdown
    // table rows begin with '|', which stripMargin would eat as a
    // margin marker (it mangled the first two generated tables)
    val table = (Seq(
      s"| query | sf0.1 (s) | ${factor}× (s) | ratio |",
      "|---|---|---|---|") ++ names.map { n =>
      f"| $n | ${base(n)}%.2f | ${big(n)}%.2f | ${big(n) / base(n)}%.1f× |"
    }).mkString("\n")
    val md =
      s"""# SCALE — measured wall-time scaling of the dedup/ANN headliners
         |
         |`graft.tools.ScaleGen` synthesizes a ${factor}× documents+embeddings
         |corpus from sf0.1 (deterministic replicas that preserve the
         |source's exact-duplicate rate and same-length near-dups while
         |decorrelating replica shingles and growing vocabulary per
         |Heaps' law — see the ScaleGen scaladoc), and
         |`graft.tools.ScaleProbe` times each headliner on both corpora
         |(min of $passes cache-cleared passes, noop sink, local[32]).
         |Reproduce with:
         |
         |```
         |sbt "runMain graft.tools.ScaleGen /root/testdata/sf0.1 /root/repo/scaleprobe/x$factor $factor"
         |sbt "runMain graft.tools.ScaleProbe /root/testdata/sf0.1 /root/repo/scaleprobe/x$factor $factor"
         |```
         |
         |""".stripMargin + table + s"""
         |
         |Input scale: documents ×$factor rows, embeddings ×$factor rows.
         |A ratio ≲ ${factor}× (plus constant overheads at the small end)
         |is the linearity the 100-TB designs claim: banded LSH with
         |bucket caps (q41), AllPairs/PPJoin prefix+length+positional
         |filtering (q151), k-means-blocked SemDeDup (q160), √N-centroid
         |IVF (q62), and IVF-PQ ADC serving (q190) all avoid any N²
         |stage, so wall time should track corpus size ~linearly with a
         |sublinear extra for the √N centroid stages.
         |
         |## What the first probe run caught (round 8)
         |
         |The probe is not a formality — its first run found a real scale
         |defect. q151's verify stage joined every candidate pair back to
         |both docs' exploded shingle ROWS (|cands| × |shingles| ≈ 1B rows
         |at 10×) and filled the disk with sort spill; and the first
         |10× generator kept the source's tiny CLOSED vocabulary, which
         |saturates the 3-gram shingle space (every shingle's df grows
         |with corpus size → 132× candidate growth at 10× input — the
         |documented worst case for exact similarity joins). Fixes, both
         |measured above: (a) q151 now prunes candidates with the full
         |AllPairs/PPJoin bundle inside the pair aggregation and verifies
         |via array_intersect over per-doc shingle arrays (one row per
         |candidate): 260 s → ~15 s at 10×, and ~1.8× faster at sf0.1,
         |bit-identical oracle; (b) ScaleGen replicas mint fresh word
         |types at ~30% of positions (open-vocabulary growth, as real
         |crawls exhibit), so shingle df distributions stay
         |corpus-size-independent, as they are in natural text.
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(outMd),
      md.getBytes("UTF-8"))
    println(md)
  }
}
