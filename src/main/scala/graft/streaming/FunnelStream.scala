package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One funnel-relevant event: user, ordering key (any monotone long — epoch
  * µs in practice), event type. */
final case class FunnelEvent(user_id: Long, ts: Long, event_type: String)

/** Emitted whenever a user's funnel advances: the settled step timestamps
  * (ascending, one per completed step) and the step count. */
final case class FunnelProgress(
    user_id: Long, steps_completed: Int, times: Seq[Long])

/** Streaming twin of [[graft.operators.Funnel.updateFunnelState]]: the
  * greedy-earliest funnel as `flatMapGroupsWithState`, one ascending
  * settled-prefix vector per user (at most |steps| longs — bounded state,
  * the [[ActiveStateStream]] posture).
  *
  * Within a micro-batch events process in `ts` order; settling step i
  * requires `event_type == steps(i)` and `ts` STRICTLY after step i-1 —
  * the exact batch semantics, so folding micro-batches reproduces the
  * one-shot [[graft.operators.Funnel.funnelSteps]] under the same
  * time-ordered-delivery contract (late events belong to the batch
  * operator's bounded recompute, not the stream). Equal-`ts` process
  * order is immaterial: the strict `>` means an event tied with the
  * just-settled timestamp can never settle the next step, and competing
  * equal-`ts` candidates for the SAME step settle the same value.
  *
  * Emits only on change (Update-mode shape): the latest row per user is
  * the current funnel state.
  */
object FunnelStream {

  private def step(steps: IndexedSeq[String])(
      user: Long,
      rows: Iterator[FunnelEvent],
      state: GroupState[Seq[Long]]): Iterator[FunnelProgress] = {
    var settled = state.getOption.getOrElse(Seq.empty).toVector
    var changed = false
    for (e <- rows.toArray.sortBy(_.ts)) {
      if (settled.length < steps.length &&
        e.event_type == steps(settled.length) &&
        (settled.isEmpty || e.ts > settled.last)) {
        settled = settled :+ e.ts
        changed = true
      }
    }
    if (changed) {
      state.update(settled)
      Iterator.single(FunnelProgress(user, settled.length, settled))
    } else Iterator.empty
  }

  /** Works on a streaming Dataset (state carried via the checkpoint) AND
    * on a batch Dataset (state starts empty — the spec's parity proof
    * against the batch operator). */
  def track(events: Dataset[FunnelEvent], steps: Seq[String]): Dataset[FunnelProgress] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        step(steps.toIndexedSeq))
  }
}
