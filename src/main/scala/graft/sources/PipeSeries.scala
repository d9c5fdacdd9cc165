package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pipe-delimited parallel-series interchange (reference S5/S6: stock and
  * trends CSVs carry `price_history`/`date_history` as `|`-joined strings,
  * `src/ingest_metrics.py:8-26,97-179`). The explode is pure native Spark —
  * `split` + `arrays_zip` + `explode` — no custom Generator needed; the
  * snapshot-change fallbacks (`daily_change_pct` from the last two points,
  * `seven_day_change_pct` from last vs 8th-from-last) are `element_at`
  * arithmetic on the un-exploded arrays, exactly as the reference computes
  * them when the CSV omits the columns (`src/ingest_metrics.py:150-165`).
  */
object PipeSeries {

  /** Explode parallel pipe series into one row per point.
    * Output: key columns + (dateColOut, valueColOut). */
  def explodeSeries(
      df: DataFrame,
      keyCols: Seq[String],
      valuesCol: String,
      datesCol: String,
      valueOut: String = "value",
      dateOut: String = "date"): DataFrame = {
    val zipped = df.withColumn("__z",
      arrays_zip(split(col(valuesCol), "\\|"), split(col(datesCol), "\\|")))
    zipped
      .select((keyCols.map(col) :+ explode(col("__z")).as("__p")): _*)
      .select((keyCols.map(col) :+
        col("__p.1").as(dateOut) :+
        col("__p.0").as(valueOut)): _*)
  }

  /** Snapshot change percentages from a pipe value series: last-vs-prev and
    * last-vs-8th-from-last (7 observations back), null when too short. */
  def snapshotChanges(valuesCol: Column): (Column, Column) = {
    val arr = transform(split(valuesCol, "\\|"), v => v.cast("double"))
    val n = size(arr)
    val last = element_at(arr, -1)
    def pct(prev: Column): Column =
      when(prev.isNotNull.and(prev =!= 0.0d), (last - prev) / prev * 100.0d)
    (pct(when(n >= 2, element_at(arr, -2))),
      pct(when(n >= 8, element_at(arr, -8))))
  }
}
