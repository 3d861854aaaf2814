package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver-generated testdata layout
  * (`TESTDATA.md`): one parquet file per table under an sf directory.
  *
  * All readers go through `spark.read.parquet` so Catalyst gets a
  * relation it can push filters/column pruning into (vectorized reader,
  * partition pruning when the path is a partitioned layout).
  */
object Tables {
  /** TEST-ONLY fault-injection hook (RetryDeterminismSpec): when set,
    * every table load is wrapped by this transform. The spec installs
    * an identity `mapPartitions` that throws on the FIRST attempt of a
    * deterministic subset of partitions, forcing Spark's task-retry
    * path through every scan-rooted stage (in a pipelined plan the
    * scan task IS the shuffle map task), then asserts the catalog
    * output is byte-identical to a clean run — the cluster reality
    * (speculative execution, preemption, lost executors) that
    * local[n] with maxFailures=1 never exercises. Production code
    * never sets it; `null`-free Option keeps the hot path a single
    * volatile read.
    */
  @volatile private[graft] var chaos: Option[DataFrame => DataFrame] = None

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    chaos match { case Some(f) => f(df); case None => df }
  }

  /** Scan-parallelism floor for PER-ROW-KERNEL operators (optimization
    * guide §2.5 "input skew" / §6 "input split size"): the testdata
    * ships each table as ONE parquet file with ONE row group, so a scan
    * — and every map-side stage Spark pipelines into it (tokenize,
    * shingle, minhash, distance kernels) — is a single task on a
    * single core no matter how many the session has. Splits cannot
    * help (a row group is the atomic read unit), so the only remedy is
    * an explicit exchange: hash-repartition on the table's primary key
    * to `defaultParallelism` partitions.
    *
    * Scale-adaptive by construction, not a local[32] constant: the
    * guard `scan partitions < defaultParallelism` makes this a no-op
    * the moment the input is already at least core-parallel (any real
    * multi-file/multi-row-group layout — the 10x/30x/100x scale-probe
    * dirs and any production table), so the extra exchange exists
    * precisely when the input layout under-parallelizes the box and
    * never at scale. Keying by the primary key (not round-robin) keeps
    * the shuffle deterministic under task retry (no
    * sortBeforeRepartition pass), spreads evenly (the keys are unique
    * or near-unique), and lets Catalyst reuse the exchange for
    * downstream operations keyed the same way. Filters/projections
    * still reach the scan: PushDownPredicates pushes through
    * RepartitionByExpression, so PushedFilters/ReadSchema are
    * unchanged (PlanAudit r15 confirms).
    *
    * Placement is MEASURED per operator, not blanket (three full-bench
    * A/Bs, r15): a TABLE-level spread won wherever the downstream is
    * per-row CPU (shingle/minhash/winnow/entropy/cosine kernels,
    * −0.3 to −0.8 s each at sf0.1) but LOST wherever the first
    * operator is an aggregation or a tiny-table band join — map-side
    * partial combine already shrinks the single-partition scan to
    * partial-state rows, and the pre-aggregation exchange of raw rows
    * violates guide §2.3 "aggregate before you shuffle" (spreading
    * lineitem/orders/events cost +14 s across the relational/events
    * families; documents-spread cost the native-kernel multimodal
    * family +2.1 s standalone). So the spread is applied INSIDE the
    * operators whose map side is provably kernel-heavy — the
    * shingle/minhash/simhash builders, the repetition/entropy/PII text
    * kernels, the exact brute-force similarity arms — and nowhere
    * else. Callers pass the table's primary key.
    *
    * SPARK_GRAFT_SPREAD=0 disables (dev A/B hook; never set by the
    * driver).
    *
    * The no-op guard reads the scan's ACTUAL layout (ADVICE r15 #1):
    * `df.rdd.getNumPartitions` counts file SPLITS, which are sized by
    * `spark.sql.files.maxPartitionBytes` — a single-file
    * single-row-group table LARGER than maxPartitionBytes×parallelism
    * produces >= defaultParallelism splits of which all but one are
    * EMPTY (a parquet row group is the atomic read unit), so the split
    * count no-ops the guard exactly on the pathological layout the
    * helper exists for; it also forces a physical-planning pass per
    * call site. Instead: when `df`'s lineage roots in one parquet
    * relation, the upper bound on non-empty scan tasks is
    * min(row groups, splits) summed over files — if the relation has
    * >= defaultParallelism FILES it is parallel regardless of row
    * groups (no footer reads), otherwise the per-file row-group counts
    * come from the parquet footers (driver-side KB-sized reads, cached
    * per (session, fileset) for the life of the session — the files
    * under an sf dir are immutable within a session, the same contract
    * Chunker's memos document). Non-scan-rooted inputs (test fixtures,
    * derived unions) keep the split-count guard.
    */
  private[graft] def spread(df: DataFrame, keys: String*): DataFrame = {
    if (sys.env.get("SPARK_GRAFT_SPREAD").contains("0")) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    val nonEmpty = nonEmptyScanPartitions(df)
      .getOrElse(df.rdd.getNumPartitions)
    if (nonEmpty < p) df.repartition(p, keys.map(col): _*) else df
  }

  /** Target rows per shuffle partition for ITERATIVE driver loops
    * (label propagation, PageRank, CC, SSSP, LPA): ~4M narrow unsafe
    * rows ≈ the 64 MB AQE advisory partition size. Loops plan a fresh
    * round per sweep, so their shuffles must be sized from the DATA
    * (VERDICT r15 #3), not the session's core-count default, which ran
    * every round of a dimension-sized loop as 32 near-empty tasks
    * (per-round fixed cost = rounds × stages × task overhead).
    * Scale-adaptive in both directions: 1 partition for a 25-node
    * graph or 5k-doc corpus, thousands at a 1e10-row one (the rule
    * yields MORE than a core-count constant once rows demand it —
    * same shape as autoStatePartitions' streaming rule).
    */
  val RowsPerLoopPartition = 4000000L

  /** ceil(rows / [[RowsPerLoopPartition]]), floor 1 — the shuffle
    * partition count an iterative loop should pin via
    * withStatePartitions for a state/edge volume of `rows`.
    */
  private[graft] def sizedLoopPartitions(rows: Long): Int =
    math.max(1L, math.min(Int.MaxValue.toLong,
      (rows + RowsPerLoopPartition - 1) / RowsPerLoopPartition)).toInt

  /** Cached per (session, fileset-root): upper bound on the number of
    * non-empty partitions a scan of that fileset can produce. See
    * [[spread]].
    */
  private val scanLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Integer]()

  private def nonEmptyScanPartitions(df: DataFrame): Option[Int] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val spark = df.sparkSession
    df.queryExecution.analyzed.collectLeaves() match {
      case Seq(lr: LogicalRelation) => lr.relation match {
        case fs: HadoopFsRelation =>
          val rootKey = fs.location.rootPaths.map(_.toString).sorted.mkString(",")
          // bound the memo (it strongly references sessions; spec
          // suites create many short-lived ones — a clear just costs a
          // few footer re-reads)
          if (scanLayoutCache.size > 256) scanLayoutCache.clear()
          Option(scanLayoutCache.computeIfAbsent((spark, rootKey), _ => {
            val p = spark.sparkContext.defaultParallelism
            val files = fs.location.inputFiles
            if (files.length >= p) Integer.valueOf(files.length)
            else {
              val conf = spark.sessionState.newHadoopConf()
              val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
              var total = 0L
              files.foreach { f =>
                val path = new org.apache.hadoop.fs.Path(f)
                val rgs =
                  try {
                    val in = org.apache.parquet.hadoop.util.HadoopInputFile
                      .fromPath(path, conf)
                    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
                    try r.getRowGroups.size.toLong finally r.close()
                  } catch { case scala.util.control.NonFatal(_) =>
                    // unreadable footer (non-parquet relation): assume
                    // the split count for this file
                    val len = path.getFileSystem(conf).getFileStatus(path).getLen
                    math.max(1L, len / math.max(1L, maxSplit))
                  }
                // splits can be fewer than row groups for small files,
                // but never more non-empty than row groups
                total += rgs
              }
              Integer.valueOf(math.min(total, Int.MaxValue.toLong).toInt)
            }
          }).intValue)
        case _ => None
      }
      case _ => None
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The events table has shipped `ts` in two physical encodings
    * across testdata generations: parquet TIMESTAMP(NANOS) (which
    * Spark 4 only reads as a raw long under
    * `spark.sql.legacy.parquet.nanosAsLong`) and parquet
    * timestamp[us] with isAdjustedToUTC=false (which Spark loads as
    * TIMESTAMP_NTZ). Normalize both to a session-TZ TimestampType at
    * microsecond precision by inspecting the LOADED dtype, so a
    * testdata regeneration can never silently break the loader:
    *
    *  - LongType        → nanos-as-long: integer-div to µs (not `/`:
    *    ns epochs ~1.7e18 overflow double's 2^53 mantissa), then
    *    `timestamp_micros`. Matches DuckDB's ns→µs truncation.
    *  - TimestampNTZType → cast to TimestampType. The session TZ is
    *    pinned UTC by every graft main, so the wall-clock fields are
    *    reinterpreted 1:1 and the µs instant is unchanged.
    *  - TimestampType   → already what downstream expects; no-op.
    *
    * The nanosAsLong conf must be set BEFORE the read so the legacy
    * encoding doesn't throw PARQUET_TYPE_ILLEGAL at schema inference;
    * it is a no-op for the µs encoding.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (s.conf.get(key, "false") != "true") s.conf.set(key, "true")
    normalizeTs(table(s, d, "events"))
  }

  /** Schema-adaptive `ts` normalization shared by the batch loader and
    * the streaming source (graft.streaming.StreamingJobs). See
    * [[events]] for the encoding matrix.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected long nanos, " +
            "timestamp_ntz, or timestamp")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
