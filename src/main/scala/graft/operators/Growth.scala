package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Growth accounting — the canonical user-base decomposition (popularized
  * by the Social Capital "accounting for growth" framework): every active
  * period splits the actives into NEW (first period ever), RETAINED
  * (active the previous period too) and RESURRECTED (returning after a
  * gap), and attributes CHURN to the first period a previously-active
  * user goes silent. The identity
  * `actives(w) = new + retained + resurrected` and
  * `retained(w) = actives(w-1) − churned(w)` make the report
  * self-auditing.
  *
  * Scale shape: one distinct to the (key, period) grain, one per-key
  * window (lag/lead over a user's own periods — partition-bounded), one
  * final period-grain aggregate. Churn needs no self-join: a user's gap
  * is visible from `lead(period)` in the same window pass.
  */
object Growth {

  /** Growth-accounting report over `(keyCol, periodCol)` activity rows
    * (duplicates fine). Churn is attributed to `active_period + 1`,
    * bounded to the observed range (the final period does not mass-churn
    * everyone). Output per period with any activity or churn:
    * `(period, n_active, n_new, n_retained, n_resurrected, n_churned)`. */
  def accounting(
      activity: DataFrame,
      keyCol: String,
      periodCol: String): DataFrame = {
    val act = activity
      .select(col(keyCol).as("k"), col(periodCol).cast("long").as("w"))
      .distinct()
    val maxW = act.agg(max(col("w"))).collect()(0).getLong(0)
    val win = Window.partitionBy(col("k")).orderBy(col("w"))
    val lane = act
      .withColumn("first_w", min(col("w")).over(
        Window.partitionBy(col("k"))))
      .withColumn("prev_w", lag(col("w"), 1).over(win))
      .withColumn("next_w", lead(col("w"), 1).over(win))
    val states = lane.groupBy(col("w").as("period"))
      .agg(count(lit(1)).as("n_active"),
        Rollups.countIf(col("w") === col("first_w")).as("n_new"),
        Rollups.countIf(col("prev_w") === col("w") - 1L).as("n_retained"),
        Rollups.countIf(col("prev_w").isNotNull &&
          col("prev_w") < col("w") - 1L).as("n_resurrected"))
    val churn = lane
      .where((col("next_w").isNull || col("next_w") > col("w") + 1L) &&
        col("w") + 1L <= maxW)
      .groupBy((col("w") + 1L).as("period"))
      .agg(count(lit(1)).as("n_churned"))
    states.join(churn, Seq("period"), "full_outer")
      .select(col("period"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }
}
