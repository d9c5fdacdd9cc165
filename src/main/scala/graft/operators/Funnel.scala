package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over event streams: ordered funnels and retention
  * cohorts — the two classic product-analytics rollups the reference's
  * events side implies but never ships (its `events` endpoints stop at
  * daily counts; cf. reference `app.py` events routes).
  *
  * Scale posture (100 TB events):
  *  - [[funnelSteps]] costs ONE shuffle on the user key no matter how many
  *    funnel steps there are: every step is a conditional running `min`
  *    over the same `partitionBy(user)` window, so Catalyst plans one
  *    Exchange followed by a chain of Window operators, and the final
  *    per-user collapse reuses the same hash partitioning (no second
  *    Exchange). Window partitions are per-user event counts — bounded by
  *    construction, never corpus-grain.
  *  - [[retentionCohorts]] is two map-side-combined hash aggregations and
  *    one co-partitioned join (both sides hashed on the user key). The
  *    distinct-user count per cell uses the two-level aggregate idiom
  *    (group to (cohort, offset, user) first, then count rows), never a
  *    `countDistinct` Expand.
  */
object Funnel {

  /** Integer floor division for SMALL non-negative longs (day/week grids):
    * `(a - pmod(a, b)) / b` — the repo's float-parity idiom; exact because
    * the operands stay far below 2^53. NOT for epoch-nanos magnitudes —
    * see [[epochDayFromNanos]] for those. */
  private def floorDiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / lit(b)).cast("long")

  /** Epoch-nanos Long → epoch-day index, through decimal(20,0) so the
    * ~1.7e18 numerator never rounds through a double (the
    * `Tables.eventTs` precedent). */
  def epochDayFromNanos(tsNs: Column): Column =
    floor(tsNs.cast("decimal(20,0)") / lit(86400000000000L)).cast("long")

  /** Greedy-earliest ordered funnel: step 1's timestamp is the user's
    * earliest `steps(0)` event; step i's is the earliest `steps(i-1)`
    * event STRICTLY after step i-1's timestamp. One output row per user
    * (every user appears, null timestamps for unreached steps) with
    * `t1..tk` and a monotone `steps_completed`.
    *
    * Timestamps stay in the source column's own ordering domain (for
    * `events.ts` that is raw nanos-since-epoch Longs) — comparisons never
    * pass through a lossy unit conversion.
    */
  def funnelSteps(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(
      !events.columns.exists(c => c.startsWith("__t") || c == "steps_completed"),
      "input columns __t*/steps_completed are reserved by funnelSteps")
    val w = Window.partitionBy(col(userCol))
    val withSteps = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) > col(s"__t$i")
      df.withColumn(s"__t${i + 1}", min(when(cond, col(tsCol))).over(w))
    }
    // collapse to user grain; values are per-user constants so min() is
    // just "pick the value" — and the groupBy reuses the window's hash
    // partitioning on the user key (no second Exchange)
    val aggs = (1 to steps.length).map(i => min(col(s"__t$i")).as(s"t$i"))
    val completed = (1 to steps.length)
      .map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _) // monotone: t_i non-null implies t_{i-1} non-null
    withSteps
      .groupBy(col(userCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("steps_completed", completed.cast("long"))
  }

  /** Weekly retention cohorts on an integer epoch-day grid: a user's
    * cohort is the week (`first_day div 7`) of their first event;
    * `week_offset` is whole weeks between an event's day and that first
    * day. Emits `(cohort_week, week_offset, n_users, n_events)` — the
    * classic retention triangle, all-integer arithmetic.
    *
    * `dayCol` must be a non-negative integer day index over `events`'s
    * columns (e.g. [[epochDayFromNanos]] of the ns timestamp).
    */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      dayCol: Column): DataFrame = {
    require(!events.columns.exists(_.startsWith("__")),
      "input __ columns are reserved by retentionCohorts")
    val days = events.select(col(userCol), dayCol.as("__d"))
    val firsts = days.groupBy(col(userCol)).agg(min(col("__d")).as("__d0"))
    days
      .join(firsts, Seq(userCol)) // co-partitioned: both hashed on userCol
      .select(
        floorDiv(col("__d0"), 7).as("cohort_week"),
        floorDiv(col("__d") - col("__d0"), 7).as("week_offset"),
        col(userCol))
      .groupBy(col("cohort_week"), col("week_offset"), col(userCol))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"), sum(col("__n")).as("n_events"))
  }

  /** Batch-incremental funnel state update. Contract (the span-screen
    * store's time-ordered posture): batches arrive in event-time order —
    * every event in `batch` is later than every event already folded into
    * `state`. Under that contract the greedy funnel IS maintainable from
    * the per-user `(t1..tk)` vector alone: a settled step never changes
    * (earlier events cannot arrive), and an unsettled step i settles on
    * the batch's earliest step-i event after t(i-1) — where "after" is
    * automatic when t(i-1) came from a previous batch.
    *
    * `state` must be [[funnelSteps]]-shaped (`userCol, t1..tk,
    * steps_completed`); pass it `limit(0)`-empty to start. Returns the
    * same shape. Users appearing only in `state` pass through unchanged;
    * new users enter with a fresh funnel. Cost per batch: one Exchange on
    * the user key for the windows + a co-partitioned outer join with the
    * state — the batch is the only thing windowed.
    */
  def updateFunnelState(
      state: DataFrame,
      batch: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(
      !batch.columns.exists(c => c.startsWith("__t") || c.startsWith("t") &&
        c.drop(1).forall(_.isDigit) || c == "steps_completed"),
      "batch columns __t*/t<i>/steps_completed are reserved by updateFunnelState")
    val joined = batch
      .join(state.drop("steps_completed"), Seq(userCol), "full")
    val w = Window.partitionBy(col(userCol))
    val withSteps = steps.zipWithIndex.foldLeft(joined) { case (df, (step, i)) =>
      val fromBatch =
        if (i == 0) min(when(col(typeCol) === step, col(tsCol))).over(w)
        else min(when(col(typeCol) === step && col(tsCol) > col(s"__t$i"),
          col(tsCol))).over(w)
      // settled state wins; otherwise settle from this batch
      df.withColumn(s"__t${i + 1}", coalesce(col(s"t${i + 1}"), fromBatch))
    }
    val aggs = (1 to steps.length).map(i => min(col(s"__t$i")).as(s"t$i"))
    val completed = (1 to steps.length)
      .map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    withSteps
      .groupBy(col(userCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("steps_completed", completed.cast("long"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * `(prev_type, event_type, n, p)` where `p` is the exact row-
    * conditional probability `n / Σ n(prev_type, ·)` — the path-analysis
    * companion to [[funnelSteps]].
    *
    * `orderCols` must totally order a user's events (e.g. `(ts,
    * event_id)`) or `lag` is nondeterministic. Scale shape: one Exchange
    * on the user key for the lag window, then one map-side-combined
    * shuffle to the (prev, next) grain — a domain-bounded table
    * (|event types|²), so the conditional-total window over it is
    * bounded-input by construction. */
  def transitionCounts(
      events: DataFrame,
      userCol: String,
      orderCols: Seq[Column],
      typeCol: String): DataFrame = {
    require(!events.columns.contains("__prev"),
      "input column __prev is reserved by transitionCounts")
    val w = Window.partitionBy(col(userCol)).orderBy(orderCols: _*)
    events
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("__prev").as("prev_type"), col(typeCol).as("event_type"))
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev_type"))))
  }

  /** RFM segmentation: per-user Recency (days since last event, against
    * the global max day), Frequency (event count), Monetary (exact cents
    * sum), each cut into `tiles` quantile bands with
    * [[Batching.groupedNtile]] — exact `NTILE(tiles) OVER (ORDER BY
    * metric, user)` semantics WITHOUT a single-partition corpus window
    * (the q77 move: distinct-value histograms + distributed rank).
    *
    * `valueCol` must be a ≤ 2-decimal money double (the repo's
    * exactMoneySum contract). Scale shape: one hash agg to user grain, a
    * 1-row broadcast for the global max day, then ONE histogram-ranked
    * ntile pass over the melted `(metric, value)` long table (metric name
    * as the partition key) and a user-grain pivot back to wide — three
    * nested groupedNtile passes each re-read their input several times,
    * so stacking them re-executed the user-grain base plan
    * multiplicatively (q95 spent ~6.5 s at sf0.1 on ~60 k users, all
    * fixed replay cost); the melt runs the kernel once over 3n rows. */
  def rfm(
      events: DataFrame,
      userCol: String,
      dayCol: Column,
      valueCol: Column,
      tiles: Int = 4): DataFrame = {
    require(!events.columns.exists(_.startsWith("__")),
      "input __ columns are reserved by rfm")
    val per = events
      .select(col(userCol), dayCol.as("__d"),
        round(valueCol * 100).cast("long").as("__cents"))
      .groupBy(col(userCol))
      .agg(max(col("__d")).as("__dmax"), count(lit(1)).as("frequency"),
        sum(col("__cents")).as("__m"))
    val gmax = per.agg(max(col("__dmax")).as("__gmax"))
    val base = per
      .crossJoin(broadcast(gmax)) // 1-row stats attach
      .select(col(userCol), (col("__gmax") - col("__dmax")).as("recency_days"),
        col("frequency"), col("__m"))
    // melt: one (metric, value) row per user per metric — all three
    // metrics are already exact longs, so one homogeneous value column
    val melted = base
      .withColumn("__kv", explode(array(
        struct(lit("r").as("k"), col("recency_days").as("v")),
        struct(lit("f").as("k"), col("frequency").as("v")),
        struct(lit("m").as("k"), col("__m").as("v")))))
      .select(col(userCol), col("recency_days"), col("frequency"), col("__m"),
        col("__kv").getField("k").as("__metric"),
        col("__kv").getField("v").as("__mval"))
    val tiled = Batching.groupedNtile(
      melted, Seq("__metric"), "__mval", userCol, tiles, "__tile")
    // exactly one row per (user, metric): first() is deterministic
    tiled
      .groupBy(col(userCol), col("recency_days"), col("frequency"), col("__m"))
      .pivot("__metric", Seq("r", "f", "m"))
      .agg(first(col("__tile")))
      .select(col(userCol), col("recency_days"), col("frequency"),
        (col("__m").cast("double") / 100.0).as("monetary"),
        col("r").as("r_tile"), col("f").as("f_tile"), col("m").as("m_tile"),
        concat_ws("-", col("r"), col("f"), col("m")).as("segment"))
  }

  /** Session-scoped conversion attribution — the journey question the
    * funnel/session family exists to answer: for every conversion event,
    * WHICH interaction gets the credit. First-touch (the session's
    * opening event type) and last-touch (the event immediately preceding
    * the conversion in its session) are the two canonical single-touch
    * models; `n_prior_events` is the path length the multi-touch models
    * would weight over.
    *
    * Sessions are gap-defined exactly like [[Sessionize.sessionize]]
    * (lag >= gapUs opens), with the ordering key tightened to
    * `(ts, event id)` so same-microsecond events attribute
    * deterministically. Everything is windows over ONE hash partition by
    * user — no joins, no self-reads of the event table; conversions that
    * open their session report a null last-touch (nothing to credit) and
    * first-touch = their own type.
    *
    * Returns one row per conversion:
    * `(user, conv_event_id, conv_ts_us, first_touch, last_touch,
    * n_prior_events)`. */
  def sessionAttribution(
      events: DataFrame,
      userCol: String,
      idCol: String,
      tsUsCol: String,
      typeCol: String,
      gapUs: Long,
      convCond: Column): DataFrame = {
    require(gapUs > 0, "gap must be positive")
    require(!events.columns.exists(_.startsWith("__at_")),
      "input must not contain reserved internal columns __at_*")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsUsCol), col(idCol))
    val withSid = events
      .where(col(userCol).isNotNull && col(tsUsCol).isNotNull)
      .withColumn("__at_pd", lag(col(tsUsCol), 1).over(w))
      .withColumn("__at_open",
        when(col("__at_pd").isNull ||
          col(tsUsCol) - col("__at_pd") >= gapUs, 1L).otherwise(0L))
      .withColumn("__at_sid",
        sum(col("__at_open"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy(col(userCol), col("__at_sid"))
      .orderBy(col(tsUsCol), col(idCol))
    withSid
      .withColumn("first_touch", first(col(typeCol)).over(
        ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("last_touch", lag(col(typeCol), 1).over(ws))
      .withColumn("n_prior_events",
        (row_number().over(ws) - 1).cast("long"))
      .where(convCond)
      .select(col(userCol), col(idCol).as("conv_event_id"),
        col(tsUsCol).as("conv_ts_us"), col("first_touch"),
        col("last_touch"), col("n_prior_events"))
  }
}
