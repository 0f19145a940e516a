package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One user-activity event on the stream. */
final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

/** Running per-user session accumulator (epoch millis). */
final case class SessionAgg(start: Long, last: Long, n: Long, total: Double)

/** One closed session. */
final case class UserSession(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    total_value: Double)

/** Streaming sessionization — the arbitrary-state twin of the batch
  * `window_session_gaps` gate (gaps-and-islands over `events`): a session
  * closes when no event arrives within `gapMs`, emitted either when a
  * later event proves the gap or when the event-time watermark passes the
  * session's timeout.
  *
  * State shape: one `SessionAgg` per active user — O(active users), not
  * O(events); at 100 TB the state store shards by user across executors
  * and the watermark bounds retention, so state never grows with history.
  */
object Sessionize {

  val DefaultGapMs: Long = 30 * 60 * 1000L

  def sessionize(events: Dataset[SessionEvent],
      gapMs: Long = DefaultGapMs,
      watermark: String = "1 hour"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionAgg]) =>
          update(user, it, state, gapMs))
  }

  /** Pure state transition (unit-testable without a stream): fold the
    * micro-batch's events (sorted — arrival order within a batch is
    * arbitrary) into the running session, emitting every session a gap
    * closes; on watermark timeout, emit the final session and clear.
    */
  private[streaming] def update(user: Long, it: Iterator[SessionEvent],
      state: GroupState[SessionAgg], gapMs: Long): Iterator[UserSession] = {
    if (state.hasTimedOut) {
      val closed = out(user, state.get)
      state.remove()
      Iterator.single(closed)
    } else {
      val sorted = it.toIndexedSeq.sortBy(_.ts.getTime)
      val closed = Vector.newBuilder[UserSession]
      var cur = state.getOption
      for (e <- sorted) {
        val t = e.ts.getTime
        cur = cur match {
          case Some(s) if t - s.last > gapMs =>
            closed += out(user, s)
            Some(SessionAgg(t, t, 1L, e.value))
          case Some(s) =>
            Some(SessionAgg(s.start, math.max(s.last, t), s.n + 1L, s.total + e.value))
          case None =>
            Some(SessionAgg(t, t, 1L, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapMs)
      }
      closed.result().iterator
    }
  }

  private def out(user: Long, s: SessionAgg): UserSession =
    UserSession(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
}
