package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One keyed event for the incremental debouncer (epoch-micros — the
  * q158 integer gap math).
  */
final case class KeyedEvent(user_id: Long, event_type: String,
                            event_id: Long, ts_us: Long)

/** The STREAMING twin of the q158 temporal debounce, through the typed
  * stateful API: state per (user_id, event_type) is just the last RAW
  * event's timestamp, carried across micro-batches — an event is
  * emitted iff it arrives more than the window after that predecessor,
  * and the state advances on EVERY event (kept or not), which is what
  * makes bursts chain exactly like the batch lag form. 8 bytes of
  * state per live key, bounded output per batch — the shape that runs
  * forever. StreamingSpec proves multi-batch output equality with the
  * q158 batch catalog query on chronologically split input.
  */
object StatefulDebounce {

  val WindowUs: Long = 300L * 1000000L // 5 min, mirrors q158

  def debounce(events: Dataset[KeyedEvent]): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Long, KeyedEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Long, String), it: Iterator[KeyedEvent],
         state: GroupState[Long]) =>
          // deterministic replay order within the batch — the q158
          // window sort; cross-batch order comes from chronological
          // arrival, with the carried timestamp bridging batches
          val evs = it.toArray.sortBy(e => (e.ts_us, e.event_id))
          var last = state.getOption.getOrElse(Long.MinValue)
          val out = Seq.newBuilder[KeyedEvent]
          for (e <- evs) {
            if (last == Long.MinValue || e.ts_us - last > WindowUs)
              out += e
            last = e.ts_us // advance on every event: bursts chain
          }
          if (last != Long.MinValue) state.update(last)
          out.result().iterator
      }
  }
}
