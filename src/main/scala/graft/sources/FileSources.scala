package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-first line-delimited file sources (JSONL + CSV): the
  * interchange formats a training-data pipeline ingests next to
  * parquet.
  *
  * Both readers take an EXPLICIT schema — at 100 TB schema inference
  * is a full extra pass over the data, so `inferSchema` is never used.
  * Malformed lines are captured, not fatal: PERMISSIVE mode + a
  * corrupt-record column, so one bad line in a billion quarantines
  * itself (filter `_corrupt_record IS NOT NULL` to audit) instead of
  * killing the job.
  *
  * JSONL is the preferred text-bearing format: newline-delimited JSON
  * is splittable at any scale and escapes embedded newlines / quotes /
  * control chars in-line. CSV without multiLine is equally splittable
  * but cannot carry raw newlines — use it for scalar columns, or pay
  * the non-splittable `multiLine = true` read (one task per file; the
  * spec covers it, the catalog path never uses it).
  */
object FileSources {

  /** Column that captures the raw text of unparseable lines. */
  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))

  def readJsonLines(spark: SparkSession, path: String,
                    schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, multiLine: Boolean = false): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .option("multiLine", multiLine.toString)
      .csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)
}
