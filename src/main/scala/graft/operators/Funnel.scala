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
}
