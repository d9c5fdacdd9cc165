package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: calendar gap-fill + forward-fill ("resample
  * to daily, carry the last observation forward") — the metrics-series
  * normalizer every dashboard/trend pipeline needs before window math
  * (trailing averages over a gappy series silently average over a variable
  * number of days; a regular spine makes ROWS frames mean what they say).
  *
  * Shape at scale:
  *  - the per-key span (min/max date) is ONE map-side-combined aggregate;
  *  - the spine is an in-row `sequence(min, max, 1 day)` explode off that
  *    span row — no driver-side calendar, no cross join against a date dim;
  *  - the observations join back at the (key, date) grain — both sides hash
  *    by the same key family, and AQE coalesces the tiny spine side;
  *  - the forward fill is `last(value, ignoreNulls) over (key ORDER BY
  *    date ROWS UNBOUNDED PRECEDING)` — one window, partitioned per key,
  *    bounded by the key's span in days (a gauge series per entity/day is
  *    thousands of rows per key, never corpus-grain).
  *
  * Each filled column `c` appears as `c` (the raw observation, null in
  * gaps) plus `c_filled`; `is_gap` marks synthesized rows (distinct from an
  * observed-but-null value).
  */
object Resample {

  private val Reserved = Seq("__rs_min", "__rs_max", "__rs_present")

  /** Daily gap-fill between each key's first and last observation, forward-
    * filling `valueCols`. `dateCol` must be castable to DateType; output
    * keeps it as a date. */
  def gapFillDaily(
      df: DataFrame,
      keys: Seq[String],
      dateCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && valueCols.nonEmpty, "keys and valueCols required")
    require(!df.columns.exists(Reserved.contains),
      s"input must not contain reserved internal columns $Reserved")
    val keyCols = keys.map(col)
    val dated = df.withColumn(dateCol, col(dateCol).cast("date"))
      .withColumn("__rs_present", lit(true))
    val spine = dated
      .groupBy(keyCols: _*)
      .agg(min(col(dateCol)).as("__rs_min"), max(col(dateCol)).as("__rs_max"))
      .select(keyCols :+ explode(
        sequence(col("__rs_min"), col("__rs_max"), expr("interval 1 day")))
        .as(dateCol): _*)
    val joined = spine.join(dated, keys :+ dateCol, "left")
    val w = Window.partitionBy(keyCols: _*).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_filled", last(col(c), ignoreNulls = true).over(w))
    }
    filled
      .withColumn("is_gap", col("__rs_present").isNull)
      .drop("__rs_present")
  }
}
