package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line concurrency: how many intervals (sessions, connections,
  * jobs, leases) are open simultaneously — the capacity-planning number
  * behind "peak concurrent users per day" and the direct analogue of the
  * reference's crisis-window overlap counting
  * (`dashboard_app/app.py:4400-4426` aggregates active alerts per day).
  *
  * Classic single-machine sweep: sort all ±1 boundary events, running
  * sum, max. Distributed, a global ordered cumulative sum is a
  * one-partition sort — so this is the textbook TWO-LEVEL prefix sum:
  *
  *  1. collapse boundaries to the (time) grain (net delta per instant —
  *     one map-side-combined shuffle, the only interval-sized exchange);
  *  2. bucket instants (e.g. by day); per-bucket totals roll to a
  *     BUCKET-grain table whose global cumulative ("carry into bucket b")
  *     is a window over |buckets| rows — bounded by the time range, not
  *     the data (a year of days = 365 rows; documented single-partition
  *     window on a provably tiny grain);
  *  3. within each bucket the cumulative runs bucket-partitioned; adding
  *     the broadcast carry gives the exact global running concurrency at
  *     every boundary instant.
  *
  * Intervals are treated as closed [start, end]: +1 at start, −1 at
  * end+1, and concurrency is evaluated AFTER applying all deltas at an
  * instant (simultaneous end/start at the same tick don't double-count —
  * the (time)-grain collapse makes this automatic).
  *
  * Returns one row per bucket that contains at least one boundary:
  * (bucket, n_changes, max_concurrency). Buckets with no boundaries
  * carry a constant concurrency (the running carry) and are omitted —
  * their peak equals the previous bucket's closing value. */
object Sweep {

  def maxConcurrency(
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def floorDiv(a: Column, b: Column): Column = ((a - pmod(a, b)) / b).cast("long")
    val deltas = intervals
      .select(col(startCol).cast("long").as("__t"), lit(1L).as("__d"))
      .unionByName(intervals
        .select((col(endCol).cast("long") + 1L).as("__t"), lit(-1L).as("__d")))
    val tg = deltas.groupBy(col("__t")).agg(sum(col("__d")).as("__net"))
      .withColumn("__b", floorDiv(col("__t"), lit(bucketWidth)))
    // bucket grain only (timespan / bucketWidth rows) — bounded domain,
    // single partition intentional
    val wb = Window.partitionBy(lit(0)).orderBy("__b")
    val carries = tg.groupBy(col("__b")).agg(sum(col("__net")).as("__btot"))
      .withColumn("__carry",
        coalesce(sum(col("__btot"))
          .over(wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__carry"))
    val wi = Window.partitionBy("__b").orderBy("__t")
    tg.join(broadcast(carries), "__b")
      .withColumn("__cum",
        col("__carry") + sum(col("__net"))
          .over(wi.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("n_changes"), max(col("__cum")).as("max_concurrency"))
      .withColumnRenamed("__b", "bucket")
  }

  /** Out-of-orderness (lateness) audit — how far behind the running
    * maximum event-time does each arriving record sit? THE number that
    * sizes a streaming watermark: a watermark tighter than the observed
    * lateness tail silently drops those records. Arrival order is the
    * caller's `orderCol` (e.g. an ingestion-monotone id); lateness of a
    * record = (max event-time over all records arriving at or before it)
    * − its own event-time.
    *
    * Same two-level decomposition as [[maxConcurrency]], with MAX as the
    * (equally associative) carry: per-bucket maxima roll to a
    * |buckets|-grain cumulative-max window, broadcast back as the carry
    * into each bucket's interior running max — no global sort.
    *
    * Returns per arrival-order bucket: (bucket, n_events, n_late,
    * max_lateness) with `n_late` counting lateness > `lateThreshold`
    * (time units = whatever `tsCol` carries). */
  def latenessAudit(
      intervalsOrdered: DataFrame,
      orderCol: String,
      tsCol: String,
      bucketWidth: Long,
      lateThreshold: Long): DataFrame =
    perEventLateness(intervalsOrdered, orderCol, tsCol, bucketWidth)
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__late") > lateThreshold, 1L).otherwise(0L)).as("n_late"),
        max(col("__late")).as("max_lateness"))
      .withColumnRenamed("__b", "bucket")

  /** The shared two-level running-max lateness kernel: per event,
    * `(max event-time over arrivals at or before it) − its own event-time`
    * — no global sort (bucket carries broadcast back, the
    * [[maxConcurrency]] decomposition). Returns
    * `(__o, __t, __b, __late)`. */
  private def perEventLateness(
      intervalsOrdered: DataFrame,
      orderCol: String,
      tsCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def floorDiv(a: Column, b: Column): Column = ((a - pmod(a, b)) / b).cast("long")
    val base = intervalsOrdered
      .select(col(orderCol).cast("long").as("__o"), col(tsCol).cast("long").as("__t"))
      .withColumn("__b", floorDiv(col("__o"), lit(bucketWidth)))
    // bucket grain only (arrival span / bucketWidth rows) — bounded
    // domain, single partition intentional
    val wb = Window.partitionBy(lit(0)).orderBy("__b")
    val carries = base.groupBy(col("__b")).agg(max(col("__t")).as("__bmax"))
      .withColumn("__carry",
        max(col("__bmax")).over(wb.rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__b"), col("__carry"))
    val wi = Window.partitionBy("__b").orderBy("__o")
    base.join(broadcast(carries), "__b")
      .withColumn("__runmax",
        greatest(
          coalesce(col("__carry"), lit(Long.MinValue)),
          max(col("__t")).over(wi.rowsBetween(Window.unboundedPreceding, 0))))
      .withColumn("__late", col("__runmax") - col("__t"))
  }

  /** Watermark planner — the decision [[latenessAudit]] informs, made
    * explicit: for each CANDIDATE allowed-lateness W, how many records a
    * streaming aggregation with that watermark would silently drop
    * (lateness > W at arrival). One lateness pass (the shared kernel), a
    * candidates-×-events explode of a literal list, one aggregate. The
    * drop counts are monotone non-increasing in W by construction — the
    * planner output IS the watermark/completeness trade-off curve. */
  def watermarkPlanner(
      intervalsOrdered: DataFrame,
      orderCol: String,
      tsCol: String,
      bucketWidth: Long,
      candidates: Seq[Long]): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate watermark")
    val late = perEventLateness(intervalsOrdered, orderCol, tsCol, bucketWidth)
    late
      .select(col("__late"),
        explode(array(candidates.map(lit): _*)).as("watermark"))
      .groupBy(col("watermark"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__late") > col("watermark"), 1L).otherwise(0L))
          .as("n_dropped"))
      .withColumn("drop_frac",
        col("n_dropped").cast("double") / col("n_events").cast("double"))
  }
}
