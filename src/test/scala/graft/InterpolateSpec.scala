package graft

import org.scalatest.funsuite.AnyFunSuite

/** q184: the engine's hourly interpolation must equal a sequential
  * recompute from the observed hourly means — gap rows exactly on the
  * line between their sandwich endpoints, observed rows untouched.
  */
class InterpolateSpec extends AnyFunSuite with CacheCleanup {
  import TestSpark.spark

  test("q184 gap values sit exactly on the line between neighbors") {
    val rows = SparkEntry.queries("q184_interpolate_hourly")(
        spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L,
        r.getLong(2), Option(r.getAs[java.lang.Double]("avg_obs")),
        r.getAs[Double]("value_interp")))
    assert(rows.nonEmpty)
    val gaps = rows.filter(_._3 == 0L)
    assert(gaps.nonEmpty, "fixture has no gap hours — test is vacuous")
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.groupBy(_._1).foreach { case (_, series) =>
      val sorted = series.sortBy(_._2)
      // spine is dense and bounded by observed hours
      assert(sorted.head._3 > 0 && sorted.last._3 > 0)
      assert(sorted.sliding(2).forall { case Array(a, b) => b._2 - a._2 == 1 })
      val observed = sorted.filter(_._4.isDefined).map(t => (t._2, t._4.get))
      sorted.foreach {
        case (_, _, _, Some(v), interp) => assert(interp == v)
        case (_, hi, _, None, interp) =>
          val (ph, pv) = observed.takeWhile(_._1 < hi).last
          val (nh, nv) = observed.dropWhile(_._1 < hi).head
          val want = r6(pv + (nv - pv) * ((hi - ph).toDouble / (nh - ph)))
          assert(interp == want, s"hour $hi: $interp != $want")
          assert(interp >= math.min(pv, nv) - 1e-9 &&
            interp <= math.max(pv, nv) + 1e-9)
      }
    }
  }
}
