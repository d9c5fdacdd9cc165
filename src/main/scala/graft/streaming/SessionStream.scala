package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One session-relevant event: user, epoch-µs ordering key, purchase flag. */
final case class SessionEvent(user_id: Long, ts: Long, is_purchase: Boolean)

/** A session emission: `closed = true` rows are FINAL (the gap elapsed
  * inside the stream); `closed = false` is the user's still-open session —
  * re-emitted whenever it changes, latest row wins (Update-mode shape). */
final case class SessionRow(
    user_id: Long, session_start_us: Long, session_end_us: Long,
    n_events: Long, n_purchases: Long, closed: Boolean)

/** The per-user state: the OPEN session only — four longs, never events.
  * Top-level (not nested/private) because the state encoder's generated
  * code needs public constructor access. */
final case class OpenSession(start: Long, end: Long, n: Long, purchases: Long)

/** Streaming twin of [[graft.operators.Sessionize.sessionize]] — gap
  * sessionization as `flatMapGroupsWithState` with O(1) state per user
  * (the open session's (start, end, n, purchases) — four longs, the
  * [[ActiveStateStream]] bounded-state posture; never an event buffer).
  *
  * Within a micro-batch events fold in `ts` order; a session CLOSES when
  * the next event arrives `>= gapUs` after the previous one — exactly the
  * batch operator's `lag`-gap boundary, so under the time-ordered-delivery
  * contract (the q112 incremental posture: batch k+1's events all follow
  * batch k's) the closed rows plus the final open rows reproduce the
  * one-shot batch session table verbatim. Late events belong to the batch
  * operator's bounded recompute, not the stream.
  *
  * Works on a streaming Dataset (state carried via the checkpoint) AND on
  * a batch Dataset (state starts empty — the spec's parity proof). */
object SessionStream {

  private def step(gapUs: Long)(
      user: Long,
      rows: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[SessionRow] = {
    var open = state.getOption
    val out = Seq.newBuilder[SessionRow]
    for (e <- rows.toArray.sortBy(_.ts)) {
      val p = if (e.is_purchase) 1L else 0L
      open match {
        case Some(o) if e.ts - o.end >= gapUs =>
          out += SessionRow(user, o.start, o.end, o.n, o.purchases, closed = true)
          open = Some(OpenSession(e.ts, e.ts, 1L, p))
        case Some(o) =>
          open = Some(OpenSession(
            o.start, math.max(o.end, e.ts), o.n + 1L, o.purchases + p))
        case None =>
          open = Some(OpenSession(e.ts, e.ts, 1L, p))
      }
    }
    open match {
      case Some(o) =>
        state.update(o)
        out += SessionRow(user, o.start, o.end, o.n, o.purchases, closed = false)
      case None => ()
    }
    out.result().iterator
  }

  def track(events: Dataset[SessionEvent], gapUs: Long): Dataset[SessionRow] = {
    require(gapUs > 0, "gap must be positive")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        step(gapUs))
  }
}
