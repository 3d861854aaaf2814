package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.LayoutWriter

/** The layout writers must produce files whose statistics can prune:
  * range-clustered files own disjoint key ranges (so min/max footer
  * stats skip whole files), and hive partitioning prunes directories
  * at plan time.
  */
class LayoutWriterSpec extends AnyFunSuite {
  import TestSpark.spark

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  test("range-clustered write: per-file key ranges are disjoint, rows intact") {
    val orders = Tables.orders(spark, TestSpark.sf0001)
    val out = tmp("graft-layout") + "/orders_by_date"
    LayoutWriter.writeRangeClustered(orders, out, numFiles = 8,
      col("o_orderdate"))

    val back = spark.read.parquet(out)
    assert(back.count() == orders.count())

    val ranges = back
      .groupBy(input_file_name().as("f"))
      // ISO timestamp strings sort chronologically
      .agg(min(col("o_orderdate")).cast("string").as("lo"),
        max(col("o_orderdate")).cast("string").as("hi"))
      .collect()
      .map(r => (r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(ranges.length > 1, "expected multiple output files")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap: hi=$hi1 vs next lo=$lo2")
      case _ =>
    }
  }

  test("filter on the cluster key reaches the scan as a pushed filter") {
    val orders = Tables.orders(spark, TestSpark.sf0001)
    val out = tmp("graft-layout-p") + "/orders_by_key"
    LayoutWriter.writeRangeClustered(orders, out, numFiles = 8,
      col("o_orderkey"))
    val q = spark.read.parquet(out).filter(col("o_orderkey") === 42L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("EqualTo(o_orderkey,42)"),
      plan.take(800))
  }

  test("compaction collapses fragmented files without changing rows") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val base = tmp("graft-compact")
    docs.repartition(24).write.mode("overwrite").parquet(s"$base/frag")
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$base/frag") == 24)

    // generous target → everything fits in one file
    val n = LayoutWriter.compact(spark, s"$base/frag", s"$base/comp",
      targetFileBytes = 64L * 1024 * 1024)
    assert(n == 1 && parquetFiles(s"$base/comp") == 1)
    val a = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val b = spark.read.parquet(s"$base/comp").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(a == b)

    // tight target → multiple files, sized from the source listing
    val n2 = LayoutWriter.compact(spark, s"$base/frag", s"$base/comp2",
      targetFileBytes = 16L * 1024)
    assert(n2 > 1 && parquetFiles(s"$base/comp2") == n2)
  }

  test("hive-partitioned write prunes directories at plan time") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val out = tmp("graft-layout-h") + "/docs_by_lang"
    LayoutWriter.writeHivePartitioned(docs, out, "lang")

    val one = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(800))
    // pruned read returns exactly the partition's rows
    assert(one.count() == docs.filter(col("lang") === "en").count())
    // and the scan touches only the matching directory
    val files = one.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("lang=en")), files.mkString(", "))
  }
}
