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
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read natively (PARQUET_TYPE_ILLEGAL). Read the nanos as a long and
    * truncate to microseconds — the same truncation DuckDB applies when
    * it loads TIMESTAMP_NS into its µs-precision TIMESTAMP, so both
    * engines see identical values. Integer `div` (not `/`): ns epochs
    * (~1.7e18) overflow double's 2^53 mantissa.
    *
    * The nanosAsLong conf should be set at session build (all graft
    * mains do); the guard below only repairs sessions that didn't, and
    * never re-mutates a correctly-configured session.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (s.conf.get(key, "false") != "true") s.conf.set(key, "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
