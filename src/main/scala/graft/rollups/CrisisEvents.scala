package graft.rollups

import graft.operators.{Effective, NarrativeRollup, Rollups, StatePropagation}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K5: the crisis-event trigger machine
  * (reference `dashboard_app/crisis_event_rollups.py:16-30,560-722`).
  *
  * Per entity-day:
  *  - `trigger_top_stories`: negative top-stories count >= 2,
  *  - `trigger_newsfeed_delta`: article_total >= 5 AND neg_pct - prior-day
  *    neg_pct >= 0.20 AND neg_count - prior >= 2 AND recent negative
  *    articles >= 2  (Decimal threshold comparisons — pct columns stay
  *    DecimalType end-to-end),
  *  - `trigger_continued_coverage`: previous day active AND recent negative
  *    articles >= 2 AND neg_pct >= 0.50,
  *  - active = any trigger AND the evidence rollup produced a primary tag;
  *    prev_active resets on calendar gaps.
  *
  * The recursion (continued_coverage depends on yesterday's `active`) is the
  * one genuinely sequential piece — expressed via
  * [[StatePropagation.propagateActive]]: start = (T1 OR T2) AND has_tag,
  * continue = C AND has_tag. Everything else is relational: exact date-1
  * self-join for prior metrics (W10 — NOT lag over sparse rows), ordered
  * evidence dedup (top-stories before articles, first occurrence wins), and
  * the gate-free narrative rollup (K4) for tags.
  */
object CrisisEvents {

  val RuleVersion = "event_v1"
  val NewsfeedDeltaPct = "0.20"
  val MinArticleTotal = 5
  val MinNegativeCountDelta = 2
  val ContinuationMinRecentNegativeArticles = 2
  val ContinuationMinNegativePct = "0.50"
  val MinNegTopStories = 2

  /** @param metrics   (date, entity_type, entity_id, entity_name,
    *                  article_negative_count, article_total_count,
    *                  article_negative_pct [decimal])
    * @param topStories item-grain negative non-finance top-stories evidence:
    *                  (date, entity_type, entity_id, title, snippet, url, source)
    * @param recentArticles same shape, recent negative articles
    * @param topStoriesOrder within-entity-day load order of the top-stories
    *                  source — the reference reads them `ORDER BY date, name,
    *                  position NULLS LAST, id` (`crisis_event_rollups.py:382`),
    *                  i.e. pass `Seq(col("position").asc_nulls_last, col("id"))`
    *                  when those columns exist. "First occurrence wins" in the
    *                  dedup depends on this order, so it must be explicit —
    *                  never derived from physical row order.
    * @param recentArticlesOrder same for recent articles (reference order
    *                  `published_at DESC NULLS LAST, id` —
    *                  `crisis_event_rollups.py:476,522`).
    * @return active crisis-event rows (entity_crisis_event_daily grain)
    */
  def build(
      metrics: DataFrame,
      topStories: DataFrame,
      recentArticles: DataFrame,
      topStoriesOrder: Seq[Column] = Nil,
      recentArticlesOrder: Seq[Column] = Nil): DataFrame = {
    val keys = Seq("date", "entity_type", "entity_id")
    val evCols = keys.map(col) ++ Seq(col("title"), col("snippet"), col("url"), col("source"))

    // ordered evidence dedup (`crisis_event_rollups.py:259-271`): key = url
    // else title::source, top-stories first, first occurrence wins. The
    // within-source position is materialized as a row_number over the
    // caller-supplied ordering (fallback: content order — deterministic even
    // though no reference analog) so the surviving row is plan-independent.
    def positioned(df: DataFrame, rank: Int, order: Seq[Column]): DataFrame = {
      val ord = if (order.nonEmpty) order
        else Seq(col("title").asc, col("url").asc, col("source").asc, col("snippet").asc)
      val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      df.withColumn("__pos", row_number().over(w))
        .select((evCols :+ col("__pos")): _*)
        .withColumn("__rank", lit(rank))
    }
    val tagged = positioned(topStories, 0, topStoriesOrder)
      .unionByName(positioned(recentArticles, 1, recentArticlesOrder))
      .withColumn("__key",
        when(lower(trim(coalesce(col("url"), lit("")))) =!= "",
          lower(trim(col("url"))))
          .otherwise(concat(lower(trim(coalesce(col("title"), lit("")))), lit("::"),
            lower(trim(coalesce(col("source"), lit("")))))))
      // NB: the reference key is never empty (the fallback always contains
      // "::"), so its `if not key` guard is dead — even an all-empty row
      // survives dedup once. No filter here, faithfully.
    val evidence = Effective.latestWins(tagged, keys :+ "__key",
      Seq(col("__rank").asc, col("__pos").asc))

    // K4 rollup (gate-free narrative rollup over the evidence set)
    val rollup = NarrativeRollup.rollupEntityDay(
      evidence
        .withColumn("sentiment", lit("negative"))
        .withColumn("finance_routine", lit(false)),
      keys, minNegativeTopStories = 1)
      .select((keys.map(col) :+ col("primary_tag") :+ col("primary_group") :+
        col("is_crisis") :+ col("negative_item_count") :+ col("tagged_item_count") :+
        col("unmatched_negative_items") :+ col("supporting_negative_items")): _*)

    // raw per-day evidence counts (pre-dedup, as the reference counts them)
    val tsCounts = topStories.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("negative_top_stories_count"))
    val artCounts = recentArticles.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("recent_negative_article_count"))

    // prior-day metrics: exact date-1 self-join (`crisis_event_rollups.py:647-661`)
    val m = metrics.select(col("date"), col("entity_type"), col("entity_id"),
      col("entity_name"),
      col("article_negative_count"), col("article_total_count"),
      col("article_negative_pct").cast("decimal(38,6)").as("article_negative_pct"))
    val prior = m.select(col("date").as("p_date"), col("entity_type").as("p_et"),
      col("entity_id").as("p_eid"),
      col("article_negative_count").as("prior_article_negative_count"),
      col("article_total_count").as("prior_article_total_count"),
      col("article_negative_pct").as("prior_article_negative_pct"))

    // key set = union of days seen in any source (`crisis_event_rollups.py:612-633`)
    val dayKeys = m.select(keys.map(col): _*)
      .union(tsCounts.select(keys.map(col): _*))
      .union(artCounts.select(keys.map(col): _*))
      .distinct()

    val base = dayKeys
      .join(m, keys, "left")
      .join(prior,
        col("entity_type") === col("p_et") && col("entity_id") === col("p_eid") &&
          col("p_date") === date_sub(col("date"), 1), "left")
      .join(tsCounts, keys, "left")
      .join(artCounts, keys, "left")
      .join(rollup, keys, "left")
      .na.fill(0L, Seq("article_negative_count", "article_total_count",
        "prior_article_negative_count", "prior_article_total_count",
        "negative_top_stories_count", "recent_negative_article_count",
        "negative_item_count", "tagged_item_count", "unmatched_negative_items",
        "supporting_negative_items"))
      .withColumn("article_negative_pct",
        coalesce(col("article_negative_pct"), lit(0).cast("decimal(38,6)")))
      .withColumn("prior_article_negative_pct",
        coalesce(col("prior_article_negative_pct"), lit(0).cast("decimal(38,6)")))
      .withColumn("article_negative_pct_delta",
        col("article_negative_pct") - col("prior_article_negative_pct"))
      .withColumn("negative_count_delta",
        col("article_negative_count") - col("prior_article_negative_count"))

    val t1 = col("negative_top_stories_count") >= MinNegTopStories
    val t2 = col("article_total_count") >= MinArticleTotal &&
      col("article_negative_pct_delta") >= lit(NewsfeedDeltaPct).cast("decimal(38,6)") &&
      col("negative_count_delta") >= MinNegativeCountDelta &&
      col("recent_negative_article_count") >= ContinuationMinRecentNegativeArticles
    val cCont = col("recent_negative_article_count") >= ContinuationMinRecentNegativeArticles &&
      col("article_negative_pct") >= lit(ContinuationMinNegativePct).cast("decimal(38,6)")
    val hasTag = col("primary_tag").isNotNull

    val flagged = base
      .withColumn("trigger_top_stories", t1)
      .withColumn("trigger_newsfeed_delta", t2)
      .withColumn("__start", (t1 || t2) && hasTag)
      .withColumn("__cont", cCont && hasTag)

    StatePropagation.propagateActive(flagged, Seq("entity_type", "entity_id"),
      "date", "__start", "__cont")
      // prev_active == (this active day extends a streak): episode_day >= 2.
      // continued_coverage can co-fire with the other triggers (reference
      // appends it independently when prev_active holds).
      .withColumn("trigger_continued_coverage",
        col("active") && col("episode_day") >= 2 && cCont)
      .filter(col("active"))
      .withColumn("trigger_sources",
        array_compact(array(
          when(col("trigger_top_stories"), "top_stories"),
          when(col("trigger_newsfeed_delta"), "newsfeed_delta"),
          when(col("trigger_continued_coverage"), "continued_coverage"))))
      .withColumn("crisis_event_rule_version", lit(RuleVersion))
      .drop("__start", "__cont", "__rank", "p_date", "p_et", "p_eid", "episode_day")
  }
}
