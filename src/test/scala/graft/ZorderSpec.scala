package graft

import org.scalatest.funsuite.AnyFunSuite

/** q185: the Morton layout must (a) equal a sequential bit-interleave
  * recompute and (b) actually deliver the two-dimensional locality it
  * exists for — per-file bounding boxes materially smaller than a
  * single-column sort's over the same file count.
  */
class ZorderSpec extends AnyFunSuite with CacheCleanup {
  import TestSpark.spark

  test("q185 files equal a sequential Morton recompute and beat 1-D sort locality") {
    val d = TestSpark.sf0001
    val ev = Tables.events(spark, d)
      .selectExpr("unix_micros(ts) div 3600000000 AS x", "user_id AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (xmin, xmax) = (ev.map(_._1).min, ev.map(_._1).max)
    val (ymin, ymax) = (ev.map(_._2).min, ev.map(_._2).max)
    def norm(v: Long, lo: Long, hi: Long) = (v - lo) * 65535L / (hi - lo)
    def morton(x16: Long, y16: Long): Long =
      (0 until 16).map(b =>
        ((x16 >> b) & 1L) << (2 * b) | ((y16 >> b) & 1L) << (2 * b + 1)).sum
    val pts = ev.map { case (x, y) =>
      (norm(x, xmin, xmax), norm(y, ymin, ymax)) }
    val expected = pts.groupBy { case (x16, y16) =>
      morton(x16, y16) >> 26 }.map { case (f, ps) =>
      (f, ps.length.toLong, ps.map(_._1).min, ps.map(_._1).max,
        ps.map(_._2).min, ps.map(_._2).max)
    }.toSet
    val got = SparkEntry.queries("q185_zorder_layout")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)

    // locality: average normalized bounding area per file, z-order vs
    // an x-sorted 64-way equal-count split (the 1-D baseline whose y
    // ranges are full-width)
    def avgArea(files: Iterable[Array[(Long, Long)]]): Double = {
      val areas = files.filter(_.nonEmpty).map { ps =>
        val xe = (ps.map(_._1).max - ps.map(_._1).min).toDouble / 65535
        val ye = (ps.map(_._2).max - ps.map(_._2).min).toDouble / 65535
        xe * ye
      }
      areas.sum / areas.size
    }
    val zFiles = pts.groupBy(p => morton(p._1, p._2) >> 26).values
      .map(_.toArray)
    val xSorted = pts.sortBy(p => (p._1, p._2))
    val xFiles = xSorted.grouped(math.max(1, xSorted.length / 64)).toSeq
    val (zA, xA) = (avgArea(zFiles), avgArea(xFiles))
    assert(zA < 0.6 * xA,
      s"z-order avg area $zA should be well under 1-D sort's $xA")
    // the qualitative difference: a 1-D sort leaves the OTHER dimension
    // full-width per file; z-order bounds both (top 6 morton bits fix
    // 3 bits of each axis -> ~1/8-width tiles)
    def medianYExt(files: Iterable[Array[(Long, Long)]]): Double = {
      val exts = files.filter(_.length > 1).map(ps =>
        (ps.map(_._2).max - ps.map(_._2).min).toDouble / 65535).toSeq.sorted
      exts(exts.size / 2)
    }
    val (zY, xY) = (medianYExt(zFiles), medianYExt(xFiles))
    assert(zY < 0.3 && xY > 0.8,
      s"median y-extent: z-order $zY should be tile-bounded, 1-D sort $xY full-width")
  }
}
