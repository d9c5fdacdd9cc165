package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact trailing-window distinct counts — the "7-day active users" class
  * of metric (the reference's daily rollups count per-day grains —
  * `mv_article_daily_counts` family; the trailing-distinct variant is the
  * one that is genuinely hard at scale because distinct does not
  * decompose over days: `|A ∪ B| ≠ |A| + |B|`).
  *
  * A window function cannot express "COUNT(DISTINCT) OVER a RANGE frame"
  * (Spark, like most engines, forbids it), and re-scanning W days per
  * output day is W× the IO. The scale-correct shape used here is the
  * contribution-explode: each distinct (day, key) pair contributes to the
  * W window-end days it is visible from, so the whole computation is
  *
  *   distinct (day, key)                — map-side-combined dedup, the
  *                                        stream shrinks to the pair grain
  *   × W bounded fan-out (sequence)     — in-row, no shuffle
  *   distinct (window_day, key)         — the union-dedup
  *   count per window_day               — map-side-combined
  *
  * Total work is W·|pairs| rows through two dedup shuffles — independent
  * of raw event volume after the first dedup, and W is a small constant.
  * Window-end days beyond the observed [min, max] day range are clipped
  * via a 1-row bounds cross-join (the A8 lazy-scalar idiom — never a
  * driver collect).
  *
  * Days in range with NO key visible in their trailing window are absent
  * from the output (count 0); compose with [[Resample]]'s calendar spine
  * if a dense series is needed.
  *
  * Returns `(day, n_active)` — for every observed-range day reachable by
  * a contribution, the exact count of distinct keys seen in the trailing
  * `windowDays`-day window ending at (and including) that day.
  */
object SlidingDistinct {

  def trailingDistinct(
      df: DataFrame,
      dayCol: String,
      keyCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1 && windowDays <= 366,
      "windowDays must be in [1, 366] — the explode fan-out is windowDays x")
    val pairs = df
      .select(col(dayCol).cast("long").as("__d"), col(keyCol).as("__k"))
      .distinct()
    val bounds = pairs.agg(min(col("__d")).as("__lo"), max(col("__d")).as("__hi"))
    pairs
      .select(
        explode(sequence(col("__d"), col("__d") + lit(windowDays - 1).cast("long")))
          .as("day"),
        col("__k"))
      .distinct()
      .crossJoin(bounds)
      .filter(col("day").between(col("__lo"), col("__hi")))
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"))
  }
}
