package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Benchmark main: runs every catalog query on SPARK_GRAFT_SF_DIR,
  * prints the full {"metric","value","unit","queries",...} JSON line
  * (also written to SPARK_GRAFT_BENCH_OUT, default
  * /tmp/graft_bench.json), then — as the very last stdout line after
  * spark.stop() — a compact headline summary small enough to survive a
  * bounded tail capture intact.
  *
  * Harness rules (VERDICT r1 #5, r2 #5):
  *  - a WARMUP pass at sf0.001 first, so the timed passes measure plans,
  *    not JVM/codegen/session warmup;
  *  - FIVE timed passes per query (SPARK_GRAFT_PASSES overrides),
  *    reporting the per-query TRIMMED MEAN across passes — drop the
  *    fastest and the slowest pass, mean the middle — plus min in
  *    "queries_min" and max-min in "queries_spread": a single-shot
  *    timing cannot tell a 127x plan regression from one GC pause
  *    (r2's official 165 s vs its 37 s re-run), and a 3-pass median
  *    lets TWO noisy passes inflate an untouched query 2.3-4x (the
  *    round-12 reboot did exactly that to the graph family, q143 pass
  *    spread 13.2 s, while per-pass minima sat at the r11 medians).
  *    With 5 passes the statistic needs three bad passes to move.
  *    "value" = sum of per-query trimmed means;
  *  - caches (Spark catalog + graft chunk-table memos + registered
  *    persisted intermediates) are cleared before EVERY pass, so each
  *    pass pays identical cold-plan work and passes are comparable;
  *  - every query is fully materialized through the `noop` sink — a
  *    `count()` would let Catalyst prune the projections being measured;
  *  - failures are REPORTED (per-query "errors" map + rc!=0), never
  *    swallowed; warmup ignores only NonFatal errors;
  *  - the headline is WEATHER-PROOF BY CONSTRUCTION (VERDICT r13 #1):
  *    when canary_agreement exceeds [[Bench.AgreementBar]] or
  *    canary_scale exceeds [[Bench.ScaleBar]] after the initial
  *    passes, up to [[Bench.MaxExtraPasses]] recovery passes run; if
  *    a bar is still blown, "value" demotes to min(trimmed-mean sum,
  *    per-query median over the CALMEST passes) — load only pushes
  *    measurements up, so the smaller of two upward-biased statistics
  *    is the better clean-cost estimate ("gate_basis" records which
  *    fired, and all candidate totals stay in the artifact; pinned
  *    evidence: BENCH_weatherproof.json).
  */
object Bench {
  /** Correctness entries whose evaluation does eager side-effecting
    * work by design (proof harnesses, not plans) — timed and reported,
    * but outside the headline total.
    */
  val SideEffectQueries: Set[String] =
    Set("ref_memo_resume", "q89_jsonl_roundtrip", "q90_csv_roundtrip",
      "q91_clustered_write", "q96_compacted_rewrite", "q125_orc_roundtrip",
      "q137_merge_schema", "q140_ivf_cells_layout", "q212_avro_roundtrip")

  /** Drift-normalizing calibration canaries (VERDICT r10 #1: the
    * driver's 171 s vs a same-day local 125 s on identical plans —
    * box weather, not code — was eating the 2x bench gate's headroom).
    * Three fixed, plan-trivial, SF-INDEPENDENT workloads (pure codegen
    * CPU / one shuffle exchange / a global sort-limit over synthetic
    * ranges — no file IO, no catalog data) timed under their own line
    * items every pass. Box drift scales these and the catalog alike,
    * so `value_normalized` = value * canaryRefSum / canarySum reads
    * round-over-round as code, with the weather divided out.
    *
    * Round-12 stabilization (VERDICT r11 #1: two same-hour runs with
    * ~1% raw delta produced canary_scale 0.959 vs 0.866 — sub-second
    * single-shot canary medians injected a phantom ±12% into the
    * normalized total): each canary is sized to ~1-2 s and timed
    * [[CanaryReps]] times per pass, reporting the TRIMMED MEAN (drop
    * min and max, average the middle) so one GC pause or JIT blip
    * cannot move a pass's sample; the across-pass spread is pinned in
    * the artifact's "canary_spread" section as the stability evidence.
    *
    * Gate discipline (ADVICE r11): the canaries are deliberately
    * IO-free, so canary_scale captures CPU/shuffle weather only — IO
    * drift (page cache, disk contention) is NOT divided out. The raw
    * "value" stays the gate metric; "value_normalized" is a DIAGNOSTIC
    * for reading round-over-round deltas, never a pass/fail input.
    *
    * Ref provenance: [[CanaryRef]] is pinned from the most recent
    * canonical full-suite sf0.1 run ON THE CURRENT BOX BOOT. A host
    * reboot can re-clock the VM (observed mid-round-12: the same
    * canaries read 2.8× their pre-reboot refs on an idle box while
    * the catalog total moved only +21%) — after a reboot, re-pin from
    * a fresh canonical run rather than interpreting canary_scale
    * across the boot boundary.
    */
  val Canaries: Seq[(String, SparkSession => org.apache.spark.sql.DataFrame)] = Seq(
    ("canary:cpu", (s: SparkSession) => s.range(0L, 96000000L, 1L, 32)
      .selectExpr("sum(xxhash64(cast(id as string)) & 1048575) as h")),
    ("canary:shuffle", (s: SparkSession) => s.range(0L, 8000000L, 1L, 32)
      .selectExpr("id % 200000 as k").groupBy("k").count()
      .selectExpr("cast(sum(count) as long) as n", "count(*) as g")),
    ("canary:sort", (s: SparkSession) => s.range(0L, 32000000L, 1L, 32)
      .selectExpr("xxhash64(id) as k").orderBy("k").limit(1000)))

  /** In-pass repetitions per canary; the pass's sample is the trimmed
    * mean of these (drop fastest + slowest, mean the rest).
    */
  val CanaryReps = 5

  /** Per-canary reference trimmed-means (seconds), pinned from the
    * round-13 canonical FULL-SUITE 5-pass local[32] run on the current
    * boot (the canaries run measurably slower inside a 220-query pass
    * than in a one-query dev run — JIT/cache context — so the anchor
    * must come from the same context the driver measures in; and a
    * reboot re-clocks the box, so the anchor must come from the boot
    * being measured — the round-12 refs read 0.35x-0.64x on this boot
    * with agreement 1.83). The ABSOLUTE values only anchor the
    * normalization scale; comparisons should always quote the ratio
    * (canary_scale), and only when canary_agreement is near 1.
    */
  val CanaryRef: Map[String, Double] = Map(
    "canary:cpu" -> 0.383, "canary:shuffle" -> 0.641, "canary:sort" -> 0.175)

  /** Weather gate (VERDICT r13 #1): the run's trimmed means are NOT
    * trusted as the headline when EITHER canary signal blows its bar —
    * canary_agreement > [[AgreementBar]] (the regimes moved apart:
    * the r13 driver run read 4.755 while inflating the headline 12%
    * over a same-boot twin; a clean same-boot run reads ~1.07-1.15)
    * or canary_scale > [[ScaleBar]] (the regimes moved TOGETHER —
    * uniform external load inflates every canary alike, so agreement
    * alone cannot see it; clean same-boot runs read 0.95-1.13).
    *
    * When a bar is blown after the initial passes, Bench first runs up
    * to [[MaxExtraPasses]] additional passes (buying samples taken
    * after transient load has passed); if a bar is STILL blown, the
    * headline demotes to the CLEAN-PASS MEDIAN: passes are ranked by
    * their own canary weather (median canary ratio of that pass),
    * passes within [[CleanPassTolerance]] of the calmest pass are
    * kept (always at least 2), and "value" = min(trimmed-mean sum,
    * clean-pass-median sum): load only ever pushes measurements UP, so
    * both candidates are upward-biased estimates of the clean cost and
    * the smaller is the better one — pass-concentrated weather (the
    * r13 event) inflates the trimmed mean while the calm-pass medians
    * stay clean, pulsed intra-pass weather can do the reverse. On a
    * clean run both statistics coincide, so the demoted headline of a
    * noise-injected run lands within noise of a clean-box run — unlike
    * a raw per-query-minimum sum, which undershoots a clean headline
    * ~15% by construction (still reported as "value_min").
    * The artifact records which basis fired ("gate_basis"), the
    * per-pass weather indices ("pass_weather"), and both candidate
    * totals, so a reader can always reconstruct the undemoted number.
    * Pinned evidence: BENCH_weatherproof.json (clean vs stressed run).
    */
  val AgreementBar = 1.5

  /** canary_scale ceiling for the uniform-load arm of the weather
    * gate — see [[AgreementBar]].
    */
  val ScaleBar = 1.5

  /** A pass qualifies as clean when its weather index is within this
    * factor of the calmest pass's — see [[AgreementBar]].
    */
  val CleanPassTolerance = 1.25

  /** Extra recovery passes attempted when a weather bar is blown,
    * before demoting the gate metric (bounded: each full pass is
    * ~3.5 min at sf0.1).
    */
  val MaxExtraPasses = 2

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def clearAll(): Unit = {
      pipeline.Chunker.clearCaches() // unpersist + forget (not just unpersist)
      spark.catalog.clearCache()
    }

    // Dev aid: SPARK_GRAFT_ONLY=q61,q41 restricts the suite to queries
    // whose name starts with a listed prefix. The driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    if (warmDir.nonEmpty) {
      Canaries.foreach { case (_, fn) =>
        try materialize(fn(spark)) catch { case NonFatal(_) => () } }
      SparkEntry.sharedBuilds.foreach { case (_, fn) =>
        try materialize(fn(spark, warmDir)) catch { case NonFatal(_) => () } }
      names.foreach { n =>
        try materialize(SparkEntry.queries(n)(spark, warmDir))
        catch { case NonFatal(_) => () }
      }
    }

    var errors = Map.empty[String, String]
    // Shared memoized builds (Chunker.sharedTable) are materialized
    // FIRST each pass under their own named timers, so the build cost
    // of a train-once-serve-many intermediate no longer lands on
    // whichever consumer query runs first in alphabetical order
    // (VERDICT r9 "what's wrong" #1: q84/q80-class numbers swung 3-10x
    // round-over-round purely from attribution). Reported in a
    // separate "shared_builds" JSON section; their sum stays inside
    // the headline "value" (same total work, now attributable).
    val sharedNames = SparkEntry.sharedBuilds.map(_._1)
    val runShared = only.isEmpty // a filtered dev run times queries standalone
    def runPass(): Map[String, Double] = {
      clearAll()
      // Canaries run FIRST each pass (even in filtered dev runs —
      // they're sub-second and make any run self-calibrating).
      val canary = Canaries.map { case (name, fn) =>
        // trimmed mean of CanaryReps in-pass repetitions (drop min and
        // max): a single GC pause or JIT deopt cannot move the sample
        val samples = (1 to CanaryReps).map { _ =>
          val t0 = System.nanoTime()
          try materialize(fn(spark))
          catch { case e: Throwable =>
            if (!errors.contains(name))
              errors += name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          }
          (System.nanoTime() - t0) / 1e9
        }.sorted
        name -> samples.slice(1, samples.size - 1).sum / (samples.size - 2)
      }.toMap
      val shared = canary ++ (if (!runShared) Map.empty[String, Double] else
        SparkEntry.sharedBuilds.map { case (name, fn) =>
          val t0 = System.nanoTime()
          try materialize(fn(spark, sfDir))
          catch { case e: Throwable =>
            if (!errors.contains(name))
              errors += name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          }
          name -> (System.nanoTime() - t0) / 1e9
        }.toMap)
      shared ++ names.map { name =>
        val t0 = System.nanoTime()
        try materialize(SparkEntry.queries(name)(spark, sfDir))
        catch { case e: Throwable =>
          if (!errors.contains(name))
            errors += name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }
    // True median: average of the two middle elements for even pass
    // counts (upper-middle alone would report the SLOWER of 2 passes).
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // Per-query across-pass statistic (VERDICT r12 #1a): at >=4 passes
    // the trimmed mean (drop fastest + slowest, mean the middle); the
    // true median below that (short dev runs). A 3-pass median moves
    // whenever 2 of 3 passes are noisy; the 5-pass trimmed mean needs
    // three.
    def stat(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size >= 4) s.slice(1, s.size - 1).sum / (s.size - 2)
      else median(xs)
    }
    // The weather-gate signals over a pass set (see [[AgreementBar]]):
    // per-canary scales = across-pass stat / pinned ref; agreement =
    // max/min of the scales; scale = their median.
    def liveCanaries: Seq[String] = Canaries.map(_._1)
      .filter(n => CanaryRef.get(n).exists(_ > 0) && !errors.contains(n))
    def scalesOf(ts: Seq[Map[String, Double]]): Seq[Double] =
      liveCanaries.map(n => stat(ts.map(_(n))) / CanaryRef(n))
    def agreementOf(ts: Seq[Map[String, Double]]): Double = {
      val s = scalesOf(ts)
      if (s.isEmpty) 1.0 else s.max / s.min
    }
    def scaleOf(ts: Seq[Map[String, Double]]): Double = {
      val s = scalesOf(ts)
      if (s.isEmpty) 1.0 else median(s)
    }
    def barBlown(ts: Seq[Map[String, Double]]): Boolean =
      agreementOf(ts) > AgreementBar || scaleOf(ts) > ScaleBar
    val timingsBuf = scala.collection.mutable.ArrayBuffer.empty[Map[String, Double]]
    (1 to passes).foreach(_ => timingsBuf += runPass())
    // Weather recovery (VERDICT r13 #1): while a weather bar is blown,
    // buy more samples — extra passes taken after transient load has
    // passed feed the clean-pass subset the gate metric demotes to.
    var extraPasses = 0
    while (barBlown(timingsBuf.toSeq) && extraPasses < MaxExtraPasses) {
      System.err.println(f"BENCH weather: agreement " +
        f"${agreementOf(timingsBuf.toSeq)}%.3f / scale " +
        f"${scaleOf(timingsBuf.toSeq)}%.3f over bars " +
        f"($AgreementBar%.2f/$ScaleBar%.2f) after ${timingsBuf.size} " +
        "passes - running an extra pass")
      extraPasses += 1
      timingsBuf += runPass()
    }
    val timings = timingsBuf.toSeq
    // An errored query's wall time is a fast-fail, not a measurement —
    // reporting it as a timing made error-vs-fast indistinguishable in
    // the r6 artifact (ADVICE r6). Errored names live ONLY in `errors`.
    val timed = (Canaries.map(_._1) ++ (if (runShared) sharedNames else Nil) ++ names)
      .filterNot(errors.contains)
    val med = timed.map(n => n -> stat(timings.map(_(n))))
    val mins = timed.map(n => n -> timings.map(_(n)).min)
    // Per-query spread (max - min across passes): lets a reader classify
    // 1.3-1.6x run-to-run drift as noise from the artifact alone,
    // without a fresh bench run (VERDICT r5 #6).
    val spread = timed.map(n => n -> (timings.map(_(n)).max - timings.map(_(n)).min))

    def jstr(s: String) = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Millisecond precision: 17-digit doubles made the r3/r4 one-line
    // JSON outgrow the driver's tail-capture window (parsed: null both
    // rounds); 130 queries at 3 decimals fit comfortably. Plain decimal
    // string, never scientific notation.
    def jnum(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def jmap(m: Seq[(String, Double)]) =
      m.map { case (k, v) => jstr(k) + ":" + jnum(v) }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    // ref_memo_resume eagerly deletes + rebuilds the on-disk memo per
    // evaluation — that's the in-plan resume PROOF, not a plan, and its
    // timing measures tmpfs writes. Report it separately so "value" and
    // "queries" measure plans only.
    val (canaryMed, med1) = med.partition(kv => kv._1.startsWith("canary:"))
    val (sharedMed, med2) = med1.partition(kv => kv._1.startsWith("shared:"))
    val (sideEff, plans) = med2.partition(kv => SideEffectQueries(kv._1))
    // shared-build medians stay inside the headline total: the work was
    // always part of "value" (it used to hide inside the first consumer
    // query); only the attribution moved. Canaries stay OUTSIDE it —
    // they're the measuring stick, not the workload.
    val total = plans.map(_._2).sum + sharedMed.map(_._2).sum
    // Min-basis twin of `total`: per-query across-pass minima over the
    // same query set (plans + shared builds). A diagnostic floor —
    // biased ~15% below a clean trimmed mean by construction, which is
    // why the weather gate demotes to the clean-pass median instead
    // (see [[AgreementBar]]).
    val totalMin = mins.filter(kv => !kv._1.startsWith("canary:") &&
      !SideEffectQueries(kv._1)).map(_._2).sum
    // Per-canary scales (VERDICT r12 #1c): after the round-12 reboot
    // the three canaries disagreed 0.37x-4.15x against their refs — a
    // single scalar averaged over regimes that disagree 11x corrects
    // nothing. So: report each canary's own measured/ref ratio
    // ("canary_scales"), take the MEDIAN ratio as canary_scale (robust
    // to one regime re-clocking), and pin "canary_agreement" =
    // max/min of the three ratios. canary_scale > 1 = this box/run is
    // SLOWER than the pinned reference; value_normalized divides that
    // weather out of "value" — a DIAGNOSTIC that is only meaningful
    // when canary_agreement is near 1 (the regimes moved together).
    // The raw "value" stays the gate metric always.
    val canaryScales = canaryMed.toSeq.sortBy(_._1).collect {
      case (n, v) if CanaryRef.contains(n) && CanaryRef(n) > 0 =>
        n -> v / CanaryRef(n)
    }
    val canaryScale =
      if (canaryScales.nonEmpty) median(canaryScales.map(_._2)) else 1.0
    val canaryAgreement =
      if (canaryScales.nonEmpty)
        canaryScales.map(_._2).max / canaryScales.map(_._2).min
      else 1.0
    val normalized = total / canaryScale
    // Weather-proof gate metric (VERDICT r13 #1): when the run STILL
    // reads weather-distorted after the recovery passes, the headline
    // demotes to the clean-pass median — see [[AgreementBar]]. The
    // trimmed mean has been proven (r13: agreement 4.755, headline
    // +12% over a same-boot twin) to inflate when three or more passes
    // are loaded; the per-pass canary weather identifies WHICH passes
    // were loaded and the medians over the calm subset read as a
    // clean-box run. gate_basis says which fired.
    val weatherDistorted = canaryAgreement > AgreementBar || canaryScale > ScaleBar
    def passWeather(t: Map[String, Double]): Double = {
      val rs = liveCanaries.map(n => t(n) / CanaryRef(n))
      if (rs.isEmpty) 1.0 else median(rs)
    }
    val passWeights = timings.map(passWeather)
    val keptIdx = {
      val wMin = passWeights.min
      val calm = timings.indices.filter(i =>
        passWeights(i) <= wMin * CleanPassTolerance)
      if (calm.size >= 2) calm
      else timings.indices.sortBy(passWeights).take(2)
    }
    val demoted = timed.map(n =>
      n -> median(keptIdx.map(i => timings(i)(n)))).toMap
    val totalClean = plans.map(kv => demoted(kv._1)).sum +
      sharedMed.map(kv => demoted(kv._1)).sum
    // Load can only push a measurement UP, so both candidate totals
    // are upward-biased estimates of the clean-box cost and the SMALLER
    // one is the better estimate: pass-concentrated weather (the r13
    // event) inflates the trimmed mean while the calm-pass medians stay
    // clean; pulsed intra-pass weather can land inside canary-calm
    // passes and inflate the medians while per-query trimming sheds it.
    // Neither mechanism can drive either statistic BELOW the clean
    // cost, so min() stays honest.
    val gateValue =
      if (weatherDistorted) math.min(total, totalClean) else total
    val gateBasis =
      if (!weatherDistorted) "trimmed_mean"
      else if (totalClean <= total) "clean_pass_median"
      else "trimmed_mean_weathered_min"
    val nonPlan = (kv: (String, Double)) =>
      SideEffectQueries(kv._1) || kv._1.startsWith("shared:") ||
        kv._1.startsWith("canary:")
    // across-pass spread of the per-pass trimmed means — the canary's
    // own stability evidence (VERDICT r11 #1); canary_scale is only
    // trustworthy when these are small relative to the medians
    val canarySpread = spread.filter(_._1.startsWith("canary:"))
    val line = s"""{"metric":"total","value":${jnum(gateValue)},"gate_basis":"$gateBasis","agreement_bar":${jnum(AgreementBar)},"scale_bar":${jnum(ScaleBar)},"extra_passes":$extraPasses,"pass_weather":${passWeights.map(jnum).mkString("[", ",", "]")},"passes_kept":${keptIdx.size},"value_trimmed":${jnum(total)},"value_clean_pass":${jnum(totalClean)},"value_min":${jnum(totalMin)},"unit":"sec","passes":${timings.size},"canary":${jmap(canaryMed)},"canary_ref":${jmap(CanaryRef.toSeq.sorted)},"canary_scales":${jmap(canaryScales)},"canary_scale":${jnum(canaryScale)},"canary_agreement":${jnum(canaryAgreement)},"canary_spread":${jmap(canarySpread)},"value_normalized":${jnum(normalized)},"queries":${jmap(plans)},"queries_min":${jmap(mins.filterNot(nonPlan))},"queries_spread":${jmap(spread.filterNot(nonPlan))},"shared_builds":${jmap(sharedMed)},"side_effect_queries":${jmap(sideEff)},"errors":$es,"sf":"$sfDir"}"""
    // The full per-query line outgrew the driver's 2000-char stdout tail
    // window at ~136 queries (r3/r4/r5 all recorded parsed:null because
    // the line's HEAD — "{"metric":... — fell outside the window). So:
    // the full JSON goes to a file + one human-readable print, and the
    // VERY LAST stdout line is a compact (<200 char) summary that is
    // guaranteed to sit, complete, inside any bounded tail capture.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    // /tmp is volatile across rounds; also persist the detail next to
    // the build (cwd = repo root under the driver's sbt fork) so the
    // full per-query map survives in-repo regardless of tail-capture
    // size (ADVICE r6).
    val repoDetail = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPO_OUT", "BENCH_detail.json")
    for (p <- Seq(detailPath, repoDetail).distinct)
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes("UTF-8"))
      catch { case NonFatal(e) => System.err.println(s"bench detail write failed ($p): $e") }
    println(line)
    spark.stop()
    val compact = s"""{"metric":"total","value":${jnum(gateValue)},"gate_basis":"$gateBasis","unit":"sec","passes":${timings.size},"canary_scale":${jnum(canaryScale)},"canary_agreement":${jnum(canaryAgreement)},"value_normalized":${jnum(normalized)},"n_queries":${plans.size},"n_errors":${errors.size},"sf":"$sfDir","detail":"$detailPath"}"""
    println(compact)
    if (errors.nonEmpty) sys.exit(1)
  }
}
