package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecDotSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("native vec_dot is BIT-equal to the HOF fold it replaces") {
    val rows = (0 until 50).map { r =>
      (r.toLong,
        Array.tabulate(64)(i => (math.sin(r * 64 + i) * 2).toFloat),
        Array.tabulate(64)(i => (math.cos(r * 64 + i) * 2).toFloat))
    }
    val df = rows.toDF("id", "a", "b")
    val both = df.select(
      functions.vec_dot($"a", $"b").as("native"),
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    both.foreach { r =>
      // exact bit equality, not tolerance — same IEEE op order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("self dot == squared norm, empty and mismatched lengths") {
    val df = Seq(
      (1L, Array(1f, 2f, 3f), Array(1f, 2f, 3f, 99f)), // extra tail ignored
      (2L, Array.empty[Float], Array.empty[Float]))
      .toDF("id", "a", "b")
    val out = df.select($"id", functions.vec_dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 14.0)
    assert(out(2L) == 0.0)
  }
}
