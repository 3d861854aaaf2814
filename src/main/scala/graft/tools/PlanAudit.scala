package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Generates `PLANS.md`: a per-query PHYSICAL-PLAN SHAPE audit over the
  * whole catalog — shuffle/broadcast exchange counts, join strategies,
  * whole-stage-codegen span count, scan count and filter/column
  * pushdown — plus each query's latest bench seconds when
  * `BENCH_detail.json` is present. The table is the repo-side twin of
  * the per-round plan audit: a reviewer can see at a glance that a
  * projection query plans with zero shuffles, that every nested-loop
  * join is a whitelisted broadcast pattern (PlanGuardSpec enforces the
  * bound), and which queries pay the wide exchanges their scaladocs
  * claim they need.
  *
  * Plans are INSPECTED, not run (`queryExecution.executedPlan` before
  * any action = the initial adaptive plan with exchanges inserted);
  * the eager side-effect entries (file round-trips) do their
  * sf0.001-sized writes during construction, same as PlanGuardSpec.
  *
  * Run: sbt "runMain graft.tools.PlanAudit"
  */
object PlanAudit {

  final case class Shape(shuffles: Int, bcasts: Int, smj: Int, bhj: Int,
                         shj: Int, bnlj: Int, wscg: Int, scans: Int,
                         pushed: Int, windows: Int, aggs: Int)

  def shapeOf(plan: SparkPlan): Shape = {
    var s = Shape(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    // each persisted lineage is counted ONCE, matching what the first
    // evaluation actually runs — an iterative query references round
    // k-1's cached state from several places in round k's plan, and
    // re-walking it per reference multiplied the counts (q143's 2
    // pointer-doubling rounds read as 110 shuffles instead of 17)
    val seenCaches = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(p: SparkPlan): Unit = p.foreach {
      case n: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(n.executedPlan)
      case n: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        // count the cached lineage too: it runs once per session, but
        // it is real work the query's first evaluation pays
        if (seenCaches.add(n.relation.cachedPlan)) walk(n.relation.cachedPlan)
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        s = s.copy(shuffles = s.shuffles + 1)
      case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeLike =>
        s = s.copy(bcasts = s.bcasts + 1)
      case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        s = s.copy(smj = s.smj + 1)
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        s = s.copy(bhj = s.bhj + 1)
      case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        s = s.copy(shj = s.shj + 1)
      case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
        s = s.copy(bnlj = s.bnlj + 1)
      case _: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        s = s.copy(wscg = s.wscg + 1)
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        s = s.copy(scans = s.scans + 1,
          pushed = s.pushed + (if (f.dataFilters.nonEmpty) 1 else 0))
      case _: org.apache.spark.sql.execution.window.WindowExec =>
        s = s.copy(windows = s.windows + 1)
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        s = s.copy(aggs = s.aggs + 1)
      case _ =>
    }
    walk(plan)
    s
  }

  /** Minimal extraction of {"name":secs} pairs from the bench detail
    * line (no JSON library on the classpath; the format is ours).
    */
  def benchTimes(path: String): Map[String, Double] =
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) Map.empty
    else {
      val full = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
      // the detail line repeats every name under "queries_min"/"
      // queries_spread"/"side_effect_queries" — scope to the median map
      // (plus the side-effect map, whose names are disjoint)
      def section(tag: String): String = {
        val i = full.indexOf("\"" + tag + "\":")
        if (i < 0) "" else {
          val rest = full.substring(i)
          val end = rest.indexOf('}')
          if (end < 0) rest else rest.substring(0, end + 1)
        }
      }
      val txt = section("queries") + section("side_effect_queries")
      "\"(q[0-9]+[a-z0-9_]*|ref_[a-z_]+)\":([0-9]+\\.[0-9]+)".r
        .findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outMd = if (args.length > 1) args(1) else "/root/repo/PLANS.md"
    val benchPath = if (args.length > 2) args(2) else "/root/repo/BENCH_detail.json"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // AQE defers codegen collapse (and can elide exchanges) until
      // stages materialize — audit the STATIC plan so codegen spans
      // and exchange counts reflect the full pre-runtime shape
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val times = benchTimes(benchPath)
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sh = shapeOf(fn(spark, sfDir).queryExecution.executedPlan)
      val t = times.get(name).map(v => f"$v%.2f").getOrElse("—")
      s"| $name | $t | ${sh.shuffles} | ${sh.bcasts} | ${sh.smj}/${sh.bhj}/${sh.shj}/${sh.bnlj} " +
        s"| ${sh.wscg} | ${sh.scans} (${sh.pushed}) | ${sh.windows} | ${sh.aggs} |"
    }
    graft.pipeline.Chunker.clearCaches()
    spark.stop()
    val header = Seq(
      "| query | bench s | shuffles | bcasts | joins SMJ/BHJ/SHJ/BNLJ | codegen spans | scans (w/ pushdown) | windows | aggs |",
      "|---|---|---|---|---|---|---|---|---|")
    val intro =
      """# PLANS — physical-plan shape audit over the full catalog
        |
        |Generated by `sbt "runMain graft.tools.PlanAudit"` (plan
        |INSPECTION only — no query runs; the STATIC plan with AQE off,
        |so exchanges and codegen spans reflect the full pre-runtime
        |shape, persisted lineages included). `bench s` is the
        |query's seconds from the latest in-repo `BENCH_detail.json`
        |(sf0.1, median of 3 cache-cleared passes). Reading guide:
        |
        |- **shuffles** — wide exchanges; the operators' scaladocs claim
        |  which ones they need (word-count class, doc-keyed aggregates,
        |  band joins). A projection/filter query shows 0.
        |- **joins** — every BNLJ is a whitelisted broadcast pattern with
        |  a bounded build side; PlanGuardSpec FAILS the build otherwise.
        |- **codegen spans** — whole-stage-codegen regions; the hot
        |  scalar paths (tokenize/hash/dot) are native expressions inside
        |  these spans.
        |- **scans (w/ pushdown)** — parquet scans, and how many carry
        |  pushed data filters.
        |""".stripMargin
    val md = intro + "\n" + (header ++ rows).mkString("\n") + "\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(outMd),
      md.getBytes("UTF-8"))
    println(s"wrote $outMd (${rows.size} queries)")
  }
}
