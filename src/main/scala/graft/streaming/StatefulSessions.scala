package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event for the typed sessionizer (timestamps as epoch micros —
  * integer gap math, same as the q34 batch catalog query).
  */
final case class SessionEvent(user_id: Long, event_id: Long, ts_us: Long,
                              value: Double)

/** One closed session. */
final case class UserSession(user_id: Long, session_idx: Long,
                             session_start_us: Long, n_events: Long,
                             value_sum: Double)

/** Gap-based sessionization through the TYPED stateful API —
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the extension
  * point for state machines the built-in `session_window` cannot
  * express (per-key custom merge logic, carried counters, ...).
  *
  * This is the BATCH-COMPLETE variant: each group's full event history
  * arrives in one call (Spark runs flatMapGroupsWithState in batch mode
  * with empty state), so every session closes by end-of-group. An
  * incremental streaming deployment keeps the open session in
  * `GroupState` and closes it on event-time timeout; the engine's
  * shipping streaming sessionizer is the native
  * [[StreamingJobs.sessionCounts]] (state-store backed, watermark
  * bounded) — this class exists for the custom-state surface and is
  * parity-tested against the q34 catalog query.
  */
object StatefulSessions {

  val GapUs: Long = 1800L * 1000000L // 30 min, mirrors q34

  def sessionize(events: Dataset[SessionEvent]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, UserSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[SessionEvent], _: GroupState[Long]) =>
          // Deterministic replay order: (ts, event_id) — identical to
          // the q34 window sort.
          val evs = it.toArray.sortBy(e => (e.ts_us, e.event_id))
          val out = Seq.newBuilder[UserSession]
          var idx = 0L
          var startUs = 0L
          var lastUs = Long.MinValue
          var n = 0L
          var sum = 0.0
          def close(): Unit =
            if (n > 0) out += UserSession(user, idx, startUs, n, sum)
          for (e <- evs) {
            if (lastUs == Long.MinValue || e.ts_us - lastUs > GapUs) {
              close()
              idx += 1; startUs = e.ts_us; n = 0L; sum = 0.0
            }
            lastUs = e.ts_us
            n += 1
            sum += e.value
          }
          close()
          out.result().iterator
      }
  }
}
