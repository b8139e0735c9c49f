package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input event for streaming sessionization (mirrors the `events` table). */
final case class SEvent(user_id: Long, event_id: Long, ts: Timestamp,
                        event_type: String)

/** Open-session state carried between triggers for one user. */
final case class OpenSession(sessionIdx: Long, startMs: Long, lastMs: Long,
                             nEvents: Long, nPurchases: Long)

/** Emitted closed session — same rollup schema as the batch
  * `EventOps.sessions` (user_id, session_id, n_events, n_purchases). */
final case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                            n_purchases: Long, start_ts: Timestamp,
                            end_ts: Timestamp)

/** Structured Streaming sessionizer (SURVEY.md §2 item 26): gap-based
  * sessions via `flatMapGroupsWithState`, sharing the batch operator's
  * semantics (a new session starts when the gap since the previous event
  * exceeds `gapSec`; session ids are 1-based per user in time order).
  *
  * Scale design: state is one tiny [[OpenSession]] per active user, keyed
  * by `user_id` (high cardinality — even state distribution); closed
  * sessions are emitted in Append mode as soon as a later event (or the
  * event-time timeout, driven by the watermark) proves the gap. Unbounded
  * input, bounded state.
  */
object SessionizeStream {

  val DefaultGapSec = 1800L

  def sessionize(events: Dataset[SEvent], gapSec: Long = DefaultGapSec,
                 watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, it, state) => process(userId, it, state, gapSec)
      }
  }

  private def close(userId: Long, s: OpenSession): SessionOut =
    SessionOut(userId, s.sessionIdx, s.nEvents, s.nPurchases,
      new Timestamp(s.startMs), new Timestamp(s.lastMs))

  private def process(userId: Long, it: Iterator[SEvent],
                      state: GroupState[OpenSession],
                      gapSec: Long): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      // Close the open session but KEEP the session counter: removing all
      // state would restart session ids at 1 for this user's next burst,
      // colliding with the already-emitted (user_id, session_id) keys and
      // diverging from the batch numbering. The tombstone (nEvents=0) is
      // ~40 bytes per ever-seen user — the price of batch-identical
      // sequential ids. (Key sessions by start_ts instead if even that
      // state is too much at your scale.)
      val out = state.getOption.filter(_.nEvents > 0).map(close(userId, _)).iterator
      state.getOption.foreach { s =>
        state.update(OpenSession(s.sessionIdx, s.lastMs, s.lastMs, 0L, 0L))
      }
      return out
    }
    val gapMs = gapSec * 1000L
    // Per-trigger batch for one user: bounded by trigger size; sort by time
    // (cross-trigger order is guaranteed by the watermark dropping late data).
    val events = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
    // nEvents == 0 is a closed-session tombstone: only the counter survives
    var open = state.getOption.orNull
    val closed = Vector.newBuilder[SessionOut]
    for (e <- events) {
      val t = e.ts.getTime
      val p = if (e.event_type == "purchase") 1L else 0L
      if (open == null) {
        open = OpenSession(1L, t, t, 1L, p)
      } else if (open.nEvents == 0L) {
        open = OpenSession(open.sessionIdx + 1, t, t, 1L, p)
      } else if (t - open.lastMs > gapMs) {
        closed += close(userId, open)
        open = OpenSession(open.sessionIdx + 1, t, t, 1L, p)
      } else {
        open = open.copy(lastMs = math.max(open.lastMs, t),
          nEvents = open.nEvents + 1L, nPurchases = open.nPurchases + p)
      }
    }
    if (open != null) {
      state.update(open)
      // fires once the event-time watermark passes the session's gap
      // horizon; tombstones register no timeout (nothing left to flush)
      if (open.nEvents > 0L) state.setTimeoutTimestamp(open.lastMs + gapMs)
    }
    closed.result().iterator
  }
}
