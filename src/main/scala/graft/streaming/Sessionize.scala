package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful processing via `flatMapGroupsWithState` — the
  * Structured-Streaming primitive the prompt-level design calls for when
  * windowed aggregates can't express the semantics. Sessionization: an
  * event belongs to the previous session if it arrives within `gapMs` of
  * the session's last event; otherwise it opens a new session.
  *
  * Streaming mode: state persists across micro-batches under
  * `EventTimeTimeout` — an open session is kept in state with a timeout at
  * `lastMs + gapMs`, so a session spanning several micro-batches emits
  * exactly ONCE, when the watermark passes its gap (or earlier, when a
  * same-key event beyond the gap closes it in-batch). Batch mode: each key
  * is processed once and open sessions are emitted at group end.
  */
object Sessionize {

  final case class Event(userId: Long, tsMs: Long)
  final case class SessionState(startMs: Long, lastMs: Long, n: Long)
  final case class Session(userId: Long, startMs: Long, endMs: Long, nEvents: Long)

  /** Event + its event-time column: the watermark attribute must survive
    * into the grouping for EventTimeTimeout to be allowed. (Public only
    * because encoder codegen must reach the constructor — not API.)
    */
  final case class EventWm(userId: Long, tsMs: Long,
                           eventTime: java.sql.Timestamp)

  /** Fold a key's sorted events into (closed sessions, open session). */
  private def foldEvents(userId: Long, evs: Iterator[Event],
                         init: Option[SessionState], gapMs: Long)
      : (Seq[Session], Option[SessionState]) = {
    val closed = Seq.newBuilder[Session]
    var cur = init
    for (e <- evs.toSeq.sortBy(_.tsMs)) {
      cur match {
        case Some(s) if e.tsMs - s.lastMs <= gapMs =>
          // a late within-gap event (possible across micro-batches under a
          // watermark delay) must never REWIND the session's bounds
          cur = Some(SessionState(math.min(s.startMs, e.tsMs),
            math.max(s.lastMs, e.tsMs), s.n + 1))
        case Some(s) =>
          closed += Session(userId, s.startMs, s.lastMs, s.n)
          cur = Some(SessionState(e.tsMs, e.tsMs, 1))
        case None =>
          cur = Some(SessionState(e.tsMs, e.tsMs, 1))
      }
    }
    (closed.result(), cur)
  }

  def sessions(events: Dataset[Event], gapMs: Long,
               watermarkDelayMs: Long = 0L): Dataset[Session] = {
    implicit val se = Encoders.product[SessionState]
    implicit val out = Encoders.product[Session]
    implicit val lk = Encoders.scalaLong
    if (events.isStreaming) {
      implicit val ewm = Encoders.product[EventWm]
      val wm = events.toDF()
        .withColumn("eventTime", timestamp_millis(col("tsMs")))
        .withWatermark("eventTime", s"$watermarkDelayMs milliseconds")
        .as[EventWm]
      wm.groupByKey(_.userId)
        .flatMapGroupsWithState[SessionState, Session](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
          (userId: Long, evs: Iterator[EventWm], state: GroupState[SessionState]) =>
            if (state.hasTimedOut) {
              // watermark passed lastMs + gapMs with no new events → the
              // open session is final
              val s = state.get
              state.remove()
              Iterator.single(Session(userId, s.startMs, s.lastMs, s.n))
            } else {
              val (closed, open) = foldEvents(userId,
                evs.map(e => Event(e.userId, e.tsMs)), state.getOption, gapMs)
              open match {
                case Some(s) =>
                  state.update(s)
                  // late data may put lastMs+gapMs behind the watermark;
                  // the timeout must stay strictly ahead of it
                  state.setTimeoutTimestamp(
                    math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs + 1))
                case None => state.remove()
              }
              closed.iterator
            }
        }
    } else
      events.groupByKey(_.userId)
        .flatMapGroupsWithState[SessionState, Session](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
            // batch: every key runs exactly once, so the trailing open
            // session is final by definition
            val (closed, open) = foldEvents(userId, evs, None, gapMs)
            (closed ++
              open.map(s => Session(userId, s.startMs, s.lastMs, s.n))).iterator
        }
  }
}
