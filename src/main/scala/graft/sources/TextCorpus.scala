package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's C1 source: ONE newline-delimited UTF-8 text file,
  * records = lines (`/root/reference/internal/cli/mapreduce.go:33-38`,
  * `:207`). The engine reads it distributed — no whole-file driver
  * read — and assigns stable 0-based line ids so every downstream
  * operator (chunking's running sum, ordered combine) has the total
  * order the reference gets implicitly from its in-memory string.
  *
  * `zipWithIndex` ids follow (partition, offset) order, which for file
  * sources is in-file byte order — deterministic at any parallelism.
  * It costs one extra lightweight job (per-partition counts); at 100 TB
  * that is a scan of file footers, not data.
  */
object TextCorpus {
  def lines(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).rdd.zipWithIndex()
      .map { case (text, id) => (id, text) }
      .toDF("line_id", "text")
  }
}
