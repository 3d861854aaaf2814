package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FileSources

/** Schema-first JSONL/CSV readers: malformed lines quarantine into the
  * corrupt-record column (never fatal, never silently dropped), and
  * text with embedded newlines / quotes survives the formats that can
  * carry it.
  */
class FileFormatsSpec extends AnyFunSuite {
  import TestSpark.spark

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("jsonl: malformed lines land in _corrupt_record, good lines parse") {
    val f = java.nio.file.Paths.get(tmp("graft-jsonl"), "mixed.jsonl")
    java.nio.file.Files.writeString(f,
      """{"doc_id": 1, "text": "good line"}
        |this is not json at all
        |{"doc_id": 2, "text": "another good line"}
        |{"doc_id": 3, "text": "unterminated
        |""".stripMargin)

    val back = FileSources.readJsonLines(spark, f.toString, docSchema)
      .persist() // corrupt-column-only projections need the full parse
    val corrupt = back.filter(col(FileSources.CorruptCol).isNotNull)
    assert(corrupt.count() == 2)
    assert(corrupt.select(FileSources.CorruptCol).collect()
      .map(_.getString(0)).contains("this is not json at all"))
    val good = back.filter(col(FileSources.CorruptCol).isNull)
    assert(good.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L))
    back.unpersist()
  }

  test("csv: wrong-arity lines quarantine, good lines parse") {
    val f = java.nio.file.Paths.get(tmp("graft-csv"), "mixed.csv")
    java.nio.file.Files.writeString(f,
      """doc_id,text
        |1,alpha
        |not_a_long,beta
        |2,gamma
        |""".stripMargin)
    val back = FileSources.readCsv(spark, f.toString, docSchema).persist()
    assert(back.filter(col(FileSources.CorruptCol).isNotNull).count() == 1)
    assert(back.filter(col(FileSources.CorruptCol).isNull)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    back.unpersist()
  }

  test("jsonl round-trips text with newlines, quotes, and control chars") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "line one\nline two"),
      (2L, "says \"hi\" , and, commas"),
      (3L, "tab\there nul>\u0000< bell>\u0007<"),
      (4L, ""))
    val df = nasty.toDF("doc_id", "text")
    val out = tmp("graft-jsonl-rt") + "/docs"
    FileSources.writeJsonLines(df, out)
    val got = FileSources.readJsonLines(spark, out, df.schema)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == nasty)
  }

  test("csv multiLine=true round-trips embedded newlines (non-splittable path)") {
    import spark.implicits._
    val rows = Seq((1L, "first\nsecond"), (2L, "with \"quotes\""))
    val df = rows.toDF("doc_id", "text")
    val out = tmp("graft-csv-ml") + "/docs"
    FileSources.writeCsv(df, out)
    val got = FileSources.readCsv(spark, out, df.schema, multiLine = true)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == rows)
  }
}
