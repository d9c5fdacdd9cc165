package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-entity daily flags entering the trigger machine. */
final case class FlaggedDay(entity: String, date: java.sql.Date,
    start: Boolean, cont: Boolean)

/** One emitted day: active + 1-based episode position (0 when inactive). */
final case class ActiveDay(entity: String, date: java.sql.Date,
    active: Boolean, episode_day: Int)

/** Carried per-entity state between micro-batches. */
final case class ActiveState(prevEpoch: Long, prevActive: Boolean, streak: Int)

/** Streaming W11: the crisis-event `prev_active` recursion
  * (`crisis_event_rollups.py:541-561`) as an INCREMENTAL stateful operator —
  * `KeyValueGroupedDataset.flatMapGroupsWithState` with one small state cell
  * per entity, instead of re-running the batch traversal
  * ([[graft.operators.StatePropagation]]) over the full history every day.
  *
  *   active(d) = start(d) OR (cont(d) AND active(d-1)),
  *   chain broken on calendar gaps.
  *
  * Each micro-batch (typically one daily drop) processes its days in date
  * order against the carried (prevEpoch, prevActive, streak); days at or
  * before the last processed date are dropped (the state cannot be rewound —
  * the streaming analogue of a watermark bound; replays/corrections go
  * through the batch operator over the affected window, exactly like the
  * reference's bounded recompute `crisis_event_rollups.py:725-754`).
  *
  * Scale posture: state is 3 scalars per entity (roster-bounded), the
  * per-batch work is O(new days); this is the shape that keeps the trigger
  * machine incremental when the fact stream is unbounded.
  */
object ActiveStateStream {

  private def step(
      entity: String,
      rows: Iterator[FlaggedDay],
      state: GroupState[ActiveState]): Iterator[ActiveDay] = {
    val st = state.getOption.getOrElse(ActiveState(Long.MinValue, prevActive = false, 0))
    var prevEpoch = st.prevEpoch
    var prevActive = st.prevActive
    var streak = st.streak
    val sorted = rows.toArray
      .filter(r => r.date.toLocalDate.toEpochDay > prevEpoch)
      .sortBy(_.date.toLocalDate.toEpochDay)
    // at-least-once sources can duplicate a day WITHIN a batch; only the
    // first occurrence may advance the streak
    val out = sorted.iterator.filter { r =>
      val e = r.date.toLocalDate.toEpochDay
      val keep = e > prevEpoch
      keep
    }.map { r =>
      val epoch = r.date.toLocalDate.toEpochDay
      if (prevEpoch != Long.MinValue && epoch - prevEpoch > 1) prevActive = false
      val active = r.start || (r.cont && prevActive)
      streak =
        if (active) { if (prevActive && epoch - prevEpoch == 1) streak + 1 else 1 } else 0
      prevActive = active
      prevEpoch = epoch
      ActiveDay(entity, r.date, active, streak)
    }.toArray
    if (out.nonEmpty) state.update(ActiveState(prevEpoch, prevActive, streak))
    out.iterator
  }

  /** Works on a streaming Dataset (state carried across micro-batches via
    * the checkpoint) AND on a batch Dataset (state starts empty — then it
    * matches [[graft.operators.StatePropagation.propagateActive]] exactly,
    * which is how the spec proves parity). */
  def propagate(flagged: Dataset[FlaggedDay]): Dataset[ActiveDay] = {
    import flagged.sparkSession.implicits._
    flagged
      .groupByKey(_.entity)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }
}
