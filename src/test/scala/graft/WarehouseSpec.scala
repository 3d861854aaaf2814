package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the warehouse-history operators — the
  * properties a consumer of an SCD2 dimension or an equi-depth profile
  * relies on, checked on the real sf0.001 fixture (they must hold on
  * ANY input, so the fixture is as good as a planted corpus here).
  */
class WarehouseSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private lazy val scd2 =
    graft.queries.Warehouse.queries("q113_scd2_intervals")(spark, dir)
      .cache()

  test("scd2: exactly one open (is_current) interval per customer") {
    val bad = scd2.groupBy(col("o_custkey"))
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_open"))
      .filter(col("n_open") =!= 1)
    assert(bad.count() == 0)
  }

  test("scd2: versions are dense from 1 and intervals chain exactly") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("version"))
    val checked = scd2
      .withColumn("rn", row_number().over(w))
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .withColumn("next_priority", lead(col("priority"), 1).over(w))
    // dense version numbers
    assert(checked.filter(col("version") =!= col("rn")).count() == 0)
    // each closed interval ends exactly where the next begins
    assert(checked.filter(col("next_from").isNotNull &&
      col("valid_to") =!= col("next_from")).count() == 0)
    // the final interval is the open one
    assert(checked.filter(col("next_from").isNull &&
      !col("is_current")).count() == 0)
    // consecutive versions always change the tracked attribute
    assert(checked.filter(col("next_priority").isNotNull &&
      col("next_priority") === col("priority")).count() == 0)
  }

  test("equi-depth: 20 bins whose sizes differ by at most one row") {
    val bins = graft.queries.Warehouse
      .queries("q116_equidepth_histogram")(spark, dir)
      .collect()
    assert(bins.length == 20)
    val sizes = bins.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1,
      s"bin sizes not equi-depth: min=${sizes.min} max=${sizes.max}")
    val total = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(sizes.sum == total)
  }
}
