package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of
  * [[graft.operators.SlidingDistinct.trailingDistinct]] — the live
  * "7-day active users" board, as PURE declarative Structured Streaming
  * (no custom state function): the batch operator's contribution-explode
  * becomes a stateful dedup + a windowless streaming aggregate,
  *
  *   explode (day..day+W-1, key)          in-row, W-bounded fan-out
  *   dropDuplicates(window_day, key)      Spark's dedup state store —
  *                                        exactly the pair set the batch
  *                                        operator distincts, expired by
  *                                        the watermark
  *   groupBy(window_day).count            Update-mode running counts
  *
  * The state store carries the (window_day, key) pair set — the same
  * state the incremental batch operator
  * ([[graft.operators.SlidingDistinct.trailingDistinctUpdate]]) reads
  * from its store, here bounded by the watermark horizon: a window-day
  * older than `watermarkDays` behind the stream's max event time stops
  * accepting contributions and its dedup state is dropped. Late events
  * beyond that belong to the batch operator's bounded recompute, not the
  * stream (the repo-wide streaming/late-data split).
  *
  * Emits `(day, n_active)` in Update mode — latest row per day wins,
  * counts only ever grow for a day inside the watermark. Range clipping
  * (the batch operator's [lo, hi] bound) is meaningless on an unbounded
  * stream and is left to the consumer; on identical finite input the
  * in-range rows match the batch operator exactly (spec-pinned).
  *
  * Works on a streaming DataFrame (state via checkpoint) and on a batch
  * DataFrame (dedup degenerates to distinct — the parity proof).
  */
object SlidingDistinctStream {

  def dailyActive(
      events: DataFrame,
      dayCol: String,
      keyCol: String,
      windowDays: Int,
      watermarkDays: Int = 14): DataFrame = {
    require(windowDays >= 1 && windowDays <= 366,
      "windowDays must be in [1, 366] — the explode fan-out is windowDays x")
    require(watermarkDays >= windowDays,
      "watermark must cover the window: a pair contributes up to " +
        "windowDays - 1 days forward")
    events
      .select(col(dayCol).cast("long").as("__d"), col(keyCol).as("__k"))
      .select(
        explode(sequence(col("__d"), col("__d") + lit(windowDays - 1).cast("long")))
          .as("day"),
        col("__k"))
      // event-time column derived from the window day itself: state for a
      // day expires when the watermark passes it
      .withColumn("__day_ts", timestamp_seconds(col("day") * 86400L))
      .withWatermark("__day_ts", s"$watermarkDays days")
      .dropDuplicates("day", "__day_ts", "__k")
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"))
  }
}
