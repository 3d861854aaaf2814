package graft.aggregates

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mutable running element-wise sum of vectors plus the vector count.
  * `sums` is empty until the first non-null input fixes the dimension.
  */
case class CentroidBuf(sums: Array[Double], n: Long)

/** Typed UDAF: element-wise mean (centroid) of equal-length float
  * vectors — the canonical "average the embeddings of a group" op a
  * training-data pipeline needs (cluster centroids for IVF, per-class
  * prototypes, dedup-group representatives).
  *
  * Scale shape: a single hash aggregate — partial sums per partition,
  * one merge per group, a fixed 8*dim-byte buffer. No collect_list of
  * whole vectors, no posexplode shuffle of dim× the input rows (the
  * obvious built-in formulations both materialize every element as its
  * own row or array entry; this keeps the map side at one buffer per
  * group per partition).
  */
object VecCentroid extends Aggregator[Array[Float], CentroidBuf, Array[Double]] {

  def zero: CentroidBuf = CentroidBuf(Array.emptyDoubleArray, 0L)

  def reduce(b: CentroidBuf, v: Array[Float]): CentroidBuf = {
    if (v == null) return b
    if (b.n == 0L) {
      val s = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { s(i) = v(i).toDouble; i += 1 }
      CentroidBuf(s, 1L)
    } else {
      require(v.length == b.sums.length,
        s"VecCentroid: ragged vectors (${v.length} vs ${b.sums.length})")
      var i = 0
      while (i < v.length) { b.sums(i) += v(i).toDouble; i += 1 }
      CentroidBuf(b.sums, b.n + 1L)
    }
  }

  def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
    if (a.n == 0L) return b
    if (b.n == 0L) return a
    require(a.sums.length == b.sums.length,
      s"VecCentroid: ragged partials (${a.sums.length} vs ${b.sums.length})")
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    CentroidBuf(a.sums, a.n + b.n)
  }

  def finish(b: CentroidBuf): Array[Double] =
    if (b.n == 0L) Array.emptyDoubleArray else b.sums.map(_ / b.n)

  def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}
