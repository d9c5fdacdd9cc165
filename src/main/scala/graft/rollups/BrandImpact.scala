package graft.rollups

import graft.operators.Windows
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K8: crisis brand-impact summary (reference `dashboard_app/app.py:2214-2414`):
  * per crisis tag — affected-brand counts, per-brand episode windows
  * (gaps-and-islands), how many brands were still active on the range end,
  * and a gap-free per-day trend series over the full date range (the
  * reference builds the day spine in Python; here it's a `sequence()`
  * explode joined to the daily counts).
  */
object BrandImpact {

  /** @param tagDaily rows of (date, entity_name, tag) — active crisis-tag
    *                 days per brand (entity_crisis_tag_daily grain)
    * @return per-tag summary */
  def summary(tagDaily: DataFrame): DataFrame = {
    // range end as a lazy broadcast 1-row crossJoin — NOT a driver-side
    // collect, which would both block on an extra job and recompute the
    // (unpersisted) tagDaily subtree before the main pass even starts
    val endDate = tagDaily.agg(max(col("date")).as("__range_end"))
    val episodes = Windows.episodes(tagDaily.select(col("tag"), col("entity_name"),
      col("date")), Seq("tag", "entity_name"), "date")
      .crossJoin(broadcast(endDate))
    episodes.groupBy("tag")
      .agg(
        countDistinct(col("entity_name")).as("affected_brands"),
        count(lit(1)).as("episodes"),
        (sum(col("episode_days")).cast("double") / count(lit(1))).as("avg_duration_days"),
        max(col("episode_days")).as("longest_episode_days"),
        countDistinct(when(col("episode_end") === col("__range_end"), col("entity_name")))
          .as("brands_active_on_end"))
      .orderBy(col("affected_brands").desc, col("tag"))
  }

  /** Per-tag per-day trend series over the full [min, max] date range —
    * zero-filled on days with no active brands. */
  def dailySeries(tagDaily: DataFrame): DataFrame = {
    val bounds = tagDaily.agg(min(col("date")).as("lo"), max(col("date")).as("hi"))
    val spine = bounds.select(explode(expr("sequence(lo, hi, interval 1 day)")).as("date"))
    val tags = tagDaily.select("tag").distinct()
    val counts = tagDaily.groupBy("tag", "date")
      .agg(countDistinct(col("entity_name")).as("active_brands"))
    tags.crossJoin(spine)
      .join(counts, Seq("tag", "date"), "left")
      .na.fill(0L, Seq("active_brands"))
      .orderBy("tag", "date")
  }
}
