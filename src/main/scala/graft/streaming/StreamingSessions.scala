package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization: the event-time counterpart of the batch
  * `ev_sessionize` catalog query (30-minute inactivity closes a session),
  * as the canonical `flatMapGroupsWithState` + event-time-timeout shape.
  *
  * Per-user state is one open session (start, last event, count). A new
  * event either extends it or — when the gap exceeds the session window —
  * closes it (emitted immediately) and opens the next. Sessions with no
  * further traffic close when the WATERMARK passes their idle deadline:
  * the state store arms an event-time timeout at `last_ts + gap`, so
  * emission needs no polling and state is dropped the moment a session
  * can no longer change (late events beyond the watermark are excluded by
  * the `withWatermark` contract upstream). At cluster scale state shards
  * by user across executors like every keyed-state operator, and state
  * size is O(open sessions), not O(events).
  *
  * Late data: Spark 4 filters watermark-late rows BEFORE this operator
  * (verified by spec — a straggler event hours behind the watermark never
  * invokes the function), so closed sessions stay closed. The timeout
  * registration still clamps to just past the current watermark as
  * defense-in-depth: `setTimeoutTimestamp` rejects deadlines at or below
  * the watermark, and a config that relaxes late-row filtering (e.g.
  * multiple-stateful-operator pipelines) must degrade to a late session,
  * not a crashed query.
  */
object StreamingSessions {

  case class Event(user_id: Long, event_id: Long, ts: Timestamp)
  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  val GapMs: Long = 30L * 60 * 1000

  /** `events` must already carry a watermark on `ts` (the caller picks the
    * lateness bound; specs use `withWatermark("ts", "0 seconds")`). */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        // state tuple = (session_start, last_event, n_events); a tuple
        // rather than a nested case class because Catalyst's state encoder
        // cannot codegen constructors of object-nested classes
        (user: Long, batch: Iterator[Event], state: GroupState[(Long, Long, Long)]) =>
          def close(o: (Long, Long, Long)) =
            Session(user, new Timestamp(o._1), new Timestamp(o._2), o._3)
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed last + gap: the open session is final
            val done = state.getOption.map(close).toSeq
            state.remove()
            done.iterator
          } else {
            val closed = Seq.newBuilder[Session]
            var open = state.getOption
            batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(o) if t - o._2 > GapMs =>
                  closed += close(o)
                  open = Some((t, t, 1L))
                case Some(o) =>
                  open = Some((o._1, math.max(o._2, t), o._3 + 1))
                case None =>
                  open = Some((t, t, 1L))
              }
            }
            open.foreach { o =>
              state.update(o)
              // clamp: a late-data session's natural deadline can be ≤ the
              // current watermark, which setTimeoutTimestamp rejects
              state.setTimeoutTimestamp(math.max(o._2 + GapMs,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }
}
