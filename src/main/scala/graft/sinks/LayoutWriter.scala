package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scan-pruning parquet layouts — at 100 TB the WRITE layout decides
  * every later read's cost:
  *
  *  - [[writeRangeClustered]]: `repartitionByRange` on the cluster
  *    keys + `sortWithinPartitions` before the write. Every output
  *    file then owns a DISJOINT key range (range partitioning sends
  *    equal keys to one partition), and inside a file the row groups
  *    are sorted — so parquet min/max statistics actually prune: a
  *    point or range predicate touches one file's row groups instead
  *    of every file. Unsorted writes leave every file spanning the
  *    whole key domain, and the same statistics prune nothing.
  *
  *  - [[writeHivePartitioned]]: directory partitioning for LOW
  *    cardinality keys (date, source, lang …). Partition pruning then
  *    removes whole directories at PLAN time — before any footer is
  *    read. Never partition by a high-cardinality key: millions of
  *    tiny files is the classic small-files failure.
  *
  * Compose them: partitionBy(date) + range-cluster(id) within is the
  * standard fact-table layout.
  */
object LayoutWriter {

  def writeRangeClustered(df: DataFrame, path: String, numFiles: Int,
                          keys: Column*): Unit =
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)

  def writeHivePartitioned(df: DataFrame, path: String,
                           partitionCols: String*): Unit =
    // Shuffle on the partition keys first: without it EVERY writer task
    // opens a file in EVERY directory it sees a key for (tasks × keys
    // small files — ~1.4k files for 45 cells at 32 tasks in the q140
    // layout, and the write dominated the whole entry's cost). After
    // the repartition each key lives in exactly one task, so the file
    // count is ~one per directory regardless of parallelism — the
    // shuffle is one key-hash exchange of the rows being written, which
    // the write was going to pay in seek/metadata overhead anyway.
    df.repartition(partitionCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bit-interleaved Z-order value of two non-negative integer keys,
    * each first SCALED to the full `bits`-wide domain via its maximum
    * (`aMax`/`bMax`, from static knowledge or a cheap agg). Without
    * the scaling a narrow key's bits all sit below the wide key's high
    * bits and the "curve" degenerates into a single-key sort — equal
    * bit widths are what make the interleave alternate. Sorting by
    * the result walks a space-filling curve, so consecutive rows are
    * close in BOTH dimensions at once.
    */
  def zValue(a: Column, b: Column, aMax: Long, bMax: Long,
             bits: Int = 16): Column = {
    val scale = (1L << bits).toDouble
    // doubles are exact here: key * 2^16 stays far under 2^53
    val sa = floor(a.cast("long") * scale / (aMax + 1).toDouble).cast("long")
    val sb = floor(b.cast("long") * scale / (bMax + 1).toDouble).cast("long")
    (0 until bits).map { i =>
      shiftright(sa, i).bitwiseAND(lit(1L)) * (1L << (2 * i)) +
        shiftright(sb, i).bitwiseAND(lit(1L)) * (1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Z-order clustered write: range-partition + sort on [[zValue]], so
    * every file's min/max statistics are tight in BOTH key dimensions
    * and a predicate on EITHER key prunes files. [[writeRangeClustered]]
    * on one key leaves the other key's per-file range spanning the
    * whole domain — the single-key layout's blind spot; Z-order trades
    * a little pruning power on the primary key for pruning on both.
    */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
                    a: Column, b: Column, aMax: Long, bMax: Long): Unit = {
    df.withColumn("_graft_z", zValue(a, b, aMax, bMax))
      .repartitionByRange(numFiles, col("_graft_z"))
      .sortWithinPartitions(col("_graft_z"))
      .drop("_graft_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-files compaction — the maintenance op every incremental
    * pipeline needs: streaming/append jobs leave thousands of tiny
    * files whose per-file open/footer cost dominates scans and whose
    * count melts driver listings. Rewrites `src` into
    * ceil(bytes / targetFileBytes) files at `dst` (size measured from
    * a recursive source listing, so partitioned layouts size
    * correctly), returning the file count chosen. Contents are
    * untouched — only the layout changes (q96 hash-checks
    * losslessness). The OUTPUT is a flat directory: partition columns
    * survive as data, but re-apply [[writeHivePartitioned]] on the
    * result if the directory layout must be preserved.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, src: String,
              dst: String, targetFileBytes: Long): Int = {
    val p = new org.apache.hadoop.fs.Path(src)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // RECURSIVE listing: hive-partitioned sources keep their parquet
    // under key=value subdirectories — a flat listStatus would see 0
    // bytes and silently funnel the whole dataset into one file
    var bytes = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
    }
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(src).repartition(nFiles)
      .write.mode("overwrite").parquet(dst)
    nFiles
  }
}
