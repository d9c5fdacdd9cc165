package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling — the pre-training corpus/table health check
  * (null rates, cardinalities, ranges, exact medians) as ONE aggregation
  * pass over the scan.
  *
  * Reference analogue: the ingest sanity checks scattered through
  * `src/ingest_v2.py` (row counts, empty-field guards) — generalized to a
  * declarative multi-column profile.
  *
  * 100 TB posture: every per-column statistic is computed in a single
  * `df.agg(...)` — one scan, one (tiny) reduction; emitting per-column
  * ROWS is a driver-free explode of the single aggregated row, so adding
  * columns never adds jobs or scans. The exact `countDistinct` columns
  * plan through Expand (one duplicate of the projected row per distinct
  * aggregate) — the documented price of exact cardinalities; swap in
  * `approx_count_distinct` (HLL++, no Expand) via `exact = false` when
  * profiling at full corpus scale.
  */
object Profiling {

  /** Profile numeric columns: (col_name, n, n_null, n_distinct, min_value,
    * max_value, median) — one row per column from one aggregation. */
  def profileNumeric(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__d_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        percentile(col(c), lit(0.5)).as(s"__med_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__n_$c").as("n"),
        (col("__rows") - col(s"__n_$c")).as("n_null"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"),
        col(s"__med_$c").as("median"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
