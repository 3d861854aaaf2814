package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Per-key running statistics on the ARBITRARY-STATE V2 API
  * (`transformWithState` + [[StatefulProcessor]], the Spark 4
  * replacement for mapGroupsWithState): every incoming event is
  * annotated with its user's cumulative event count and value sum so
  * far — the online-feature shape (a fraud/ranking feature store keyed
  * by user, updated per event, served with the event).
  *
  * Semantics contract (what the parity spec pins): state evolves in
  * EVENT order — (ts, event_id) ascending within each key — so the
  * emitted running sums are exactly the batch cumulative-window twin
  * (`sum over (partition by user order by ts, event_id rows unbounded
  * preceding)`), which also adds in frame order: the double additions
  * happen in the same sequence in both modes and the outputs compare
  * `==`. Within one micro-batch the input iterator is unordered, so
  * the processor sorts its micro-batch slice; ACROSS micro-batches
  * arrival order is the file-source order the harness stages.
  *
  * Scale shape: state is ONE (count, sum) pair per user in the
  * RocksDB store (transformWithState requires the RocksDB provider —
  * the job setter below pins it), reads/writes are keyed point
  * lookups, and the shuffle is the same user-keyed exchange as any
  * groupBy. TTLConfig.NONE here; a production deployment sets a TTL
  * so dormant keys age out of the store.
  */
object StatefulRunning {

  case class RunEvent(user_id: Long, event_id: Long, ts_us: Long, value: Double)
  case class RunOut(user_id: Long, event_id: Long, n_seen: Long, value_sum: Double)

  class Processor extends StatefulProcessor[Long, RunEvent, RunOut] {
    @transient private var st: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)]("running",
        Encoders.product[(Long, Double)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[RunEvent],
                                 timerValues: TimerValues): Iterator[RunOut] = {
      val ordered = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var (n, s) = if (st.exists()) st.get() else (0L, 0.0)
      val out = ordered.map { e =>
        n += 1; s += e.value
        RunOut(key, e.event_id, n, s)
      }
      st.update((n, s))
      out.iterator
    }
  }

  /** The streaming plan over an events-shaped frame. */
  def runningStats(events: DataFrame): Dataset[RunOut] = {
    val spark = events.sparkSession
    // transformWithState is RocksDB-only; pin the provider before the
    // query starts (no-op if already set)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[RunEvent]
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append(),
        Encoders.product[RunOut])
  }
}
