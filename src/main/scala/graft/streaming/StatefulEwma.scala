package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One typed event for the incremental EWMA (epoch-micros). */
final case class TypedTick(event_type: String, ts_us: Long)

/** One smoothed hourly-rate row, emitted when its bucket CLOSES. */
final case class EwmaRow(event_type: String, hour_sec: Long, n: Long,
                         ewma: Double)

/** The STREAMING twin of the q162 EWMA hourly smoothing, through the
  * typed stateful API: state per event_type is the trailing window of
  * observed hourly buckets (at most [[Lags]] (bucket, count) pairs —
  * the last one OPEN, still accumulating). A bucket's smoothed row is
  * emitted exactly when the key's first event of a LATER hour arrives
  * (the bucket is then complete under chronological arrival), and the
  * emitted value is the SAME exact-dyadic alpha=1/2 sum as the batch
  * aggregate — EwmaSpec proves the batch side order-independent,
  * StreamingSpec proves this side equal to it on chronologically split
  * input. O(Lags) state per live key, bounded output per batch — the
  * shape that runs forever. A cross-batch late tick for an
  * already-closed bucket is dropped (documented; chronological feeds
  * never produce one — the watermark-and-drop discipline of the q35
  * family in typed-state form).
  */
object StatefulEwma {

  val Lags = 12
  val HourSec = 3600L

  private def r6(x: Double): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** EWMA of bucket `b` over the trailing observed buckets — weights
    * 2^-lag are exact powers of two, so this sequential fold equals
    * the batch q162 aggregate bit-for-bit.
    */
  private def ewmaAt(buckets: List[(Long, Long)], b: Long): Double = {
    var num = 0.0
    var den = 0.0
    for ((bs, n) <- buckets) {
      val lag = (b - bs) / HourSec
      if (lag >= 0 && lag < Lags) {
        val w = math.pow(0.5, lag.toDouble)
        num += n * w
        den += w
      }
    }
    r6(num / den)
  }

  def smooth(ticks: Dataset[TypedTick]): Dataset[EwmaRow] = {
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[List[(Long, Long)], EwmaRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[TypedTick],
         state: GroupState[List[(Long, Long)]]) =>
          val evs = it.toArray.sortBy(_.ts_us)
          // ascending bucket seconds; the LAST entry is the open bucket
          var buckets = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[EwmaRow]
          for (e <- evs) {
            val b = e.ts_us / 1000000L / HourSec * HourSec
            buckets match {
              case Nil => buckets = List((b, 1L))
              case bs =>
                val (ob, on) = bs.last
                if (b == ob) buckets = bs.init :+ ((ob, on + 1L))
                else if (b > ob) {
                  out += EwmaRow(key, ob, on, ewmaAt(buckets, ob))
                  buckets = (bs :+ ((b, 1L)))
                    .filter(_._1 > b - Lags * HourSec)
                }
              // b < ob: late tick for a closed bucket — dropped
            }
          }
          if (buckets.nonEmpty) state.update(buckets)
          out.result().iterator
      }
  }
}
