package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q162's exactness claim, proven: alpha = 1/2 makes every EWMA term a
  * dyadic rational far below 53 bits, so the DISTRIBUTED aggregation
  * (arbitrary partial-sum order) must equal a sequential driver-side
  * recomputation BIT-FOR-BIT — `==` on doubles, no tolerance — which
  * no ordinary float aggregate guarantees.
  */
class EwmaSpec extends AnyFunSuite with CacheCleanup {
  import TestSpark.spark

  test("q162 ewma equals a sequential recomputation exactly") {
    val d = TestSpark.sf0001
    val counts = Tables.events(spark, d)
      .select(unix_timestamp(date_trunc("hour", col("ts"))).as("he"),
        col("event_type"))
      .groupBy(col("he"), col("event_type")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Long]("he"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("n"))
      .toMap
    val expected = counts.map { case ((he, et), n) =>
      var num = 0.0
      var den = 0.0
      for (lag <- 0 to 11)
        counts.get((he - lag * 3600L, et)).foreach { m =>
          num += m * math.pow(0.5, lag)
          den += math.pow(0.5, lag)
        }
      (he, et) -> ((n,
        BigDecimal(java.math.BigDecimal.valueOf(num / den))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = SparkEntry.queries("q162_ewma_hourly")(spark, d)
      .select(unix_timestamp(col("hour_start")).as("he"), col("event_type"),
        col("n"), col("ewma"))
      .collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getAs[Long]("he"), r.getAs[String]("event_type"))
      val (n, e) = expected(k)
      assert(r.getAs[Long]("n") == n, s"$k count")
      assert(r.getAs[Double]("ewma") == e,
        s"$k: engine ${r.getAs[Double]("ewma")} != sequential $e")
    }
  }
}
