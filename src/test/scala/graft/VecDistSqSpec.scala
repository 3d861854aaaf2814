package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecDistSqSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("native vec_dist_sq is BIT-equal to the HOF fold it replaces") {
    val rows = (0 until 50).map { r =>
      (r.toLong,
        Array.tabulate(64)(i => (math.sin(r * 64 + i) * 2).toFloat),
        Array.tabulate(64)(i => math.cos(r * 64 + i) * 2))
    }
    val df = rows.toDF("id", "v", "c")
    val both = df.select(
      functions.vec_dist_sq($"v", $"c").as("native"),
      aggregate(
        zip_with($"v", $"c", (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    both.foreach { r =>
      // exact bit equality, not tolerance — same IEEE op order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("zero distance to self, extra tail ignored, empty") {
    val df = Seq(
      (1L, Array(1f, 2f, 3f), Array(1.0, 2.0, 3.0, 99.0)), // extra tail ignored
      (2L, Array(1f, 1f), Array(4.0, 5.0)),
      (3L, Array.empty[Float], Array.empty[Double]))
      .toDF("id", "v", "c")
    val out = df.select($"id", functions.vec_dist_sq($"v", $"c").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.0)
    assert(out(2L) == 25.0)
    assert(out(3L) == 0.0)
  }

  test("null element yields NULL, matching the HOF (ADVICE r15 #2)") {
    // Option-typed arrays make the element types containsNull=true, so
    // the expression takes its null-aware path; the HOF mirror is the
    // semantics contract (a null elementwise term nulls the sum).
    val df = Seq(
      (1L, Array[Option[Float]](Some(1f), None, Some(3f)),
        Array[Option[Double]](Some(1.0), Some(2.0), Some(3.0))),
      (2L, Array[Option[Float]](Some(1f), Some(2f)),
        Array[Option[Double]](Some(2.0), None)),
      (3L, Array[Option[Float]](Some(1f), Some(2f)),
        Array[Option[Double]](Some(2.0), Some(4.0))))
      .toDF("id", "v", "c")
    val out = df.select($"id",
        functions.vec_dist_sq($"v", $"c").as("native"),
        aggregate(
          zip_with($"v", $"c",
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2),
        s"row ${r.getLong(0)}: native/hof null disagreement")
      if (!r.isNullAt(1)) assert(r.getDouble(1) == r.getDouble(2))
    }
    val byId = out.map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(byId(1L) && byId(2L) && !byId(3L))
  }
}
