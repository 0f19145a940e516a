package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One user-activity event on the stream. */
final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

/** One pending (or closed) session accumulator (epoch MICROS — the
  * resolution of the batch twin; Timestamp.getTime would truncate to ms
  * and merge sessions the batch gate splits at a sub-ms gap boundary). */
final case class SessionAgg(start: Long, last: Long, n: Long, total: Double)

/** Per-user state: pending sessions, disjoint and sorted by start. */
final case class SessionState(pending: Seq[SessionAgg])

/** One closed session. */
final case class UserSession(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    total_value: Double)

/** Streaming sessionization — the arbitrary-state twin of the batch
  * `window_session_gaps` gate (gaps-and-islands over `events`, same
  * 1-hour default gap).
  *
  * Correctness under out-of-order delivery: sessions are emitted ONLY
  * when the event-time watermark passes `session_end + gap` — never
  * eagerly on gap-proof — because a late event inside the watermark may
  * still extend, bridge, or predate a pending session. State therefore
  * holds a LIST of disjoint pending sessions per user; each event merges
  * into (possibly bridging) its neighbors, so any arrival order inside
  * the watermark folds to exactly the batch result. Append mode never has
  * to retract.
  *
  * State is O(active users × sessions-inside-watermark), not O(events);
  * at 100 TB the state store shards by user across executors and the
  * watermark bounds retention.
  */
object Sessionize {

  /** Matches the batch twin's gap (`window_session_gaps`, 1 hour). */
  val DefaultGapUs: Long = 60 * 60 * 1000000L

  /** Exact epoch microseconds of a Timestamp (getTime alone is ms). */
  private[graft] def epochUs(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def sessionize(events: Dataset[SessionEvent],
      gapUs: Long = DefaultGapUs,
      watermark: String = "1 hour"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          update(user, it, state, gapUs))
  }

  /** Merge one event into the disjoint pending list: absorb every session
    * within `gapUs` of the event (an event can bridge two), else insert a
    * new one; result stays sorted and disjoint.
    */
  private[graft] def merge(pending: Seq[SessionAgg], t: Long, value: Double,
      gapUs: Long): Seq[SessionAgg] = {
    val (touching, rest) = pending.partition(s =>
      t >= s.start - gapUs && t <= s.last + gapUs)
    val merged = touching.foldLeft(SessionAgg(t, t, 1L, value)) { (acc, s) =>
      SessionAgg(math.min(acc.start, s.start), math.max(acc.last, s.last),
        acc.n + s.n, acc.total + s.total)
    }
    (rest :+ merged).sortBy(_.start)
  }

  /** State transition: fold the micro-batch into the pending sessions,
    * then flush every session the watermark has sealed (no event can
    * arrive before the watermark, so `last + gap <= watermark` is final).
    */
  private[graft] def update(user: Long, it: Iterator[SessionEvent],
      state: GroupState[SessionState], gapUs: Long): Iterator[UserSession] = {
    val pending0 = state.getOption.map(_.pending).getOrElse(Seq.empty)
    val pending = it.foldLeft(pending0)((p, e) => merge(p, epochUs(e.ts), e.value, gapUs))
    // the engine's watermark is millis; a sealed session must satisfy
    // last + gap <= wm at micro precision, so compare in micros
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val (sealed_, open) = pending.partition(_.last + gapUs <= wmUs)
    if (open.isEmpty) state.remove()
    else {
      state.update(SessionState(open))
      // wake up when the earliest pending session can seal (round the
      // micro deadline UP to the next ms so the timeout never fires
      // early). NOTE the engine fires event-time timeouts strictly BELOW
      // the watermark (timeout < wm), so a deadline inside the
      // watermark's exact millisecond does not wake the group by itself
      // — it seals one watermark-advance later (or immediately, if a
      // sibling session's earlier deadline wakes the group). Emission is
      // therefore never early, only conservatively late by < 1 ms of
      // watermark progress; the sessionize_stream oracle replays exactly
      // this two-part rule.
      state.setTimeoutTimestamp(
        math.floorDiv(open.map(_.last).min + gapUs + 999L, 1000L))
    }
    sealed_.sortBy(_.start).iterator.map(s =>
      UserSession(user, toTs(s.start), toTs(s.last), s.n, s.total))
  }
}
