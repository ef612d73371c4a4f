package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful processing via `flatMapGroupsWithState` — the
  * Structured-Streaming primitive the prompt-level design calls for when
  * windowed aggregates can't express the semantics. Sessionization: an
  * event belongs to the previous session if it arrives within `gapMs` of
  * the session's last event; otherwise it opens a new session.
  *
  * Works in both streaming mode (state persists across micro-batches,
  * sessions emitted on gap timeout) and batch mode (each key processed
  * once — used by the specs).
  */
object Sessionize {

  final case class Event(userId: Long, tsMs: Long)
  final case class SessionState(startMs: Long, lastMs: Long, n: Long)
  final case class Session(userId: Long, startMs: Long, endMs: Long, nEvents: Long)

  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val se = Encoders.product[SessionState]
    implicit val out = Encoders.product[Session]
    implicit val lk = Encoders.scalaLong
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(_.tsMs)
          val closed = Seq.newBuilder[Session]
          var cur = state.getOption
          for (e <- sorted) {
            cur match {
              case Some(s) if e.tsMs - s.lastMs <= gapMs =>
                cur = Some(s.copy(lastMs = e.tsMs, n = s.n + 1))
              case Some(s) =>
                closed += Session(userId, s.startMs, s.lastMs, s.n)
                cur = Some(SessionState(e.tsMs, e.tsMs, 1))
              case None =>
                cur = Some(SessionState(e.tsMs, e.tsMs, 1))
            }
          }
          cur match {
            case Some(s) if state.hasTimedOut || !evs.hasNext =>
              // batch mode / group end: emit the open session too
              closed += Session(userId, s.startMs, s.lastMs, s.n)
              state.remove()
            case Some(s) => state.update(s)
            case None =>
          }
          closed.result().iterator
      }
  }
}
