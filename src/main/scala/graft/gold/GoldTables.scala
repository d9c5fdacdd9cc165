package graft.gold

import graft.operators.Rollups.countIf
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's seven materialized views as DataFrame builders
  * (the reference's seven `_mv.sql` files under `sql/`). In the target
  * deployment these are batch-computed gold
  * tables written to date-partitioned parquet and refreshed incrementally by
  * date partition (the reference refreshes whole MVs inside an advisory
  * lock, `dashboard_app/app.py:7059-7182` — partition overwrite replaces
  * that wholesale).
  *
  * Scale notes: every builder is scan -> broadcast-join dims/overrides ->
  * single hash aggregate; the fact table shuffles exactly once, on the
  * output group key. Override tables are human-entered (tiny) -> broadcast.
  * neg_pct keeps the reference's asymmetric rounding (brand 6dp / ceo 1dp,
  * `sql/article_daily_counts_mv.sql:16,37`) through decimal division —
  * double division would drift at the 6th decimal under reordering.
  */
object GoldTables {

  /** sentiment histogram columns over an effective-label column */
  private def sentimentPivot(eff: Column): Seq[Column] = Seq(
    countIf(eff === "positive").as("positive"),
    countIf(eff === "neutral").as("neutral"),
    countIf(eff === "negative").as("negative"),
    count(lit(1)).as("total"))

  private def negPct(scale: Int): Column =
    when(col("total") > 0,
      round(col("negative").cast("decimal(28,12)") / col("total"), scale))
      .otherwise(lit(0)).cast("decimal(38,6)").as("neg_pct")

  /** `article_daily_counts_mv` (`sql/article_daily_counts_mv.sql:1-46`):
    * brand + ceo union of daily sentiment histograms with override coalesce
    * (articles have NO llm fallback for sentiment). */
  def articleDailyCounts(
      companyMentionsDaily: DataFrame,
      ceoMentionsDaily: DataFrame,
      companies: DataFrame,
      ceos: DataFrame,
      companyOverrides: DataFrame,
      ceoOverrides: DataFrame): DataFrame = {
    val effB = coalesce(col("override_sentiment_label"), col("sentiment_label"))
    val brand = companyMentionsDaily
      .join(broadcast(companies.select(col("id"), col("name"))),
        col("company_id") === col("id"))
      .join(broadcast(companyOverrides
        .select(col("company_id").as("ov_company_id"), col("article_id").as("ov_article_id"),
          col("override_sentiment_label"))),
        col("company_id") === col("ov_company_id") &&
          col("article_id") === col("ov_article_id"), "left")
      .groupBy(col("date"), col("id"), col("name"))
      .agg(sentimentPivot(effB).head, sentimentPivot(effB).tail: _*)
      .select(col("date"), lit("brand").as("entity_type"), col("id").as("entity_id"),
        col("id").as("company_id"), lit(null: String).as("ceo_id"),
        col("name").as("entity_name"), col("name").as("company"),
        lit("").as("ceo"), lit("").as("alias"),
        col("positive"), col("neutral"), col("negative"), col("total"), negPct(6))

    val effC = coalesce(col("override_sentiment_label"), col("sentiment_label"))
    val ceo = ceoMentionsDaily
      .join(broadcast(ceos.select(col("id"), col("name").as("ceo_name"),
        col("company_id").as("ceo_company_id"), col("alias"))),
        col("ceo_id") === col("id"))
      .join(broadcast(companies.select(col("id").as("cid"), col("name").as("company_name"))),
        col("ceo_company_id") === col("cid"))
      .join(broadcast(ceoOverrides
        .select(col("ceo_id").as("ov_ceo_id"), col("article_id").as("ov_article_id"),
          col("override_sentiment_label"))),
        col("ceo_id") === col("ov_ceo_id") &&
          col("article_id") === col("ov_article_id"), "left")
      .groupBy(col("date"), col("id"), col("ceo_name"), col("alias"), col("cid"),
        col("company_name"))
      .agg(sentimentPivot(effC).head, sentimentPivot(effC).tail: _*)
      .select(col("date"), lit("ceo").as("entity_type"), col("id").as("entity_id"),
        col("cid").as("company_id"), col("id").as("ceo_id"),
        col("ceo_name").as("entity_name"), col("company_name").as("company"),
        col("ceo_name").as("ceo"), coalesce(col("alias"), lit("")).as("alias"),
        col("positive"), col("neutral"), col("negative"), col("total"), negPct(1))

    brand.unionByName(ceo)
  }

  /** `serp_daily_counts_mv` (`sql/serp_daily_counts_mv.sql:1-46`): runs ×
    * results with the 3-level control/sentiment coalesce (override > llm >
    * raw), brand + ceo branches. */
  def serpDailyCounts(
      serpRuns: DataFrame,
      serpResults: DataFrame,
      serpResultOverrides: DataFrame,
      companies: DataFrame,
      ceos: DataFrame): DataFrame = {
    val effControl = coalesce(col("override_control_class"), col("llm_control_class"),
      col("control_class"))
    val effSent = coalesce(col("override_sentiment_label"), col("llm_sentiment_label"),
      col("sentiment_label"))
    def pivots = Seq(
      count(lit(1)).as("total"),
      countIf(effControl === "controlled").as("controlled"),
      countIf(effSent === "negative").as("negative_serp"),
      countIf(effSent === "neutral").as("neutral_serp"),
      countIf(effSent === "positive").as("positive_serp"))

    val joined = serpRuns
      .join(serpResults.withColumnRenamed("id", "result_id"),
        col("serp_run_id") === col("id"))
      .join(broadcast(serpResultOverrides
        .select(col("serp_result_id"), col("override_sentiment_label"),
          col("override_control_class"))),
        col("result_id") === col("serp_result_id"), "left")

    val brand = joined.filter(col("entity_type") === "company")
      .join(broadcast(companies.select(col("id").as("cid"), col("name"))),
        col("company_id") === col("cid"))
      .groupBy(to_date(col("run_at")).as("date"), col("cid"), col("name"))
      .agg(pivots.head, pivots.tail: _*)
      .select(col("date"), lit("brand").as("entity_type"), col("cid").as("entity_id"),
        col("cid").as("company_id"), lit(null: String).as("ceo_id"),
        col("name").as("entity_name"), col("name").as("company"), lit("").as("ceo"),
        col("total"), col("controlled"), col("negative_serp"), col("neutral_serp"),
        col("positive_serp"))

    val ceo = joined.filter(col("entity_type") === "ceo")
      .join(broadcast(ceos.select(col("id").as("ceoid"), col("name").as("ceo_name"),
        col("company_id").as("ceo_company_id"))),
        col("ceo_id") === col("ceoid"))
      .join(broadcast(companies.select(col("id").as("cid"), col("name").as("company_name"))),
        col("ceo_company_id") === col("cid"))
      .groupBy(to_date(col("run_at")).as("date"), col("ceoid"), col("ceo_name"),
        col("cid"), col("company_name"))
      .agg(pivots.head, pivots.tail: _*)
      .select(col("date"), lit("ceo").as("entity_type"), col("ceoid").as("entity_id"),
        col("cid").as("company_id"), col("ceoid").as("ceo_id"),
        col("ceo_name").as("entity_name"), col("company_name").as("company"),
        col("ceo_name").as("ceo"),
        col("total"), col("controlled"), col("negative_serp"), col("neutral_serp"),
        col("positive_serp"))

    brand.unionByName(ceo)
  }

  /** Shared item-grain effective labels for the four serp-feature MVs:
    * item-override > url-override > llm > raw
    * (`sql/serp_feature_daily_mv.sql:8-13`). */
  def featureItemsEffective(
      items: DataFrame,
      itemOverrides: DataFrame,
      urlOverrides: DataFrame): DataFrame =
    items
      .join(broadcast(itemOverrides.select(
        col("serp_feature_item_id"),
        col("override_sentiment_label").as("ov_sent"),
        col("override_control_class").as("ov_ctl"))),
        col("id") === col("serp_feature_item_id"), "left")
      .join(broadcast(urlOverrides.select(
        col("entity_type").as("u_et"), col("entity_id").as("u_eid"),
        col("feature_type").as("u_ft"), col("url_hash").as("u_uh"),
        col("override_sentiment_label").as("uov_sent"),
        col("override_control_class").as("uov_ctl"))),
        col("entity_type") === col("u_et") && col("entity_id") === col("u_eid") &&
          col("feature_type") === col("u_ft") && col("url_hash") === col("u_uh"), "left")
      .withColumn("eff_sentiment",
        coalesce(col("ov_sent"), col("uov_sent"), col("llm_sentiment_label"),
          col("sentiment_label")))
      .withColumn("eff_control",
        coalesce(col("ov_ctl"), col("uov_ctl"), col("llm_control_class"),
          col("control_class")))

  /** `serp_feature_daily_mv` (`sql/serp_feature_daily_mv.sql:1-14`). */
  def serpFeatureDaily(items: DataFrame, itemOverrides: DataFrame,
      urlOverrides: DataFrame): DataFrame =
    serpFeatureDailyFromEffective(featureItemsEffective(items, itemOverrides, urlOverrides))

  /** Aggregate stage over an already-computed effective-items DF — the
    * batch-rebuild path ([[GoldRefresh]]) computes featureItemsEffective
    * ONCE, persists it, and derives all four serp-feature MVs from it
    * (Spark shares no subplans across separate builders). */
  def serpFeatureDailyFromEffective(eff: DataFrame): DataFrame =
    eff
      .groupBy(col("date"), col("entity_type"), col("entity_id"), col("entity_name"),
        col("feature_type"))
      .agg(
        count(lit(1)).as("total_count"),
        countIf(col("eff_sentiment") === "positive").as("positive_count"),
        countIf(col("eff_sentiment") === "neutral").as("neutral_count"),
        countIf(col("eff_sentiment") === "negative").as("negative_count"))

  /** `serp_feature_control_daily_mv` (`sql/serp_feature_control_daily_mv.sql:1-18`). */
  def serpFeatureControlDaily(items: DataFrame, itemOverrides: DataFrame,
      urlOverrides: DataFrame): DataFrame =
    serpFeatureControlDailyFromEffective(
      featureItemsEffective(items, itemOverrides, urlOverrides))

  def serpFeatureControlDailyFromEffective(eff: DataFrame): DataFrame =
    eff
      .groupBy(col("date"), col("entity_type"), col("entity_id"), col("entity_name"),
        col("feature_type"))
      .agg(
        countIf(col("eff_control").isNotNull).as("total_count"),
        countIf(col("eff_control") === "controlled").as("controlled_count"))

  /** `serp_feature_daily_index_mv` (`sql/serp_feature_daily_index_mv.sql:1-12`):
    * the entity dimension dropped — the "Index" grain. */
  def serpFeatureDailyIndex(items: DataFrame, itemOverrides: DataFrame,
      urlOverrides: DataFrame): DataFrame =
    serpFeatureDailyIndexFromEffective(
      featureItemsEffective(items, itemOverrides, urlOverrides))

  def serpFeatureDailyIndexFromEffective(eff: DataFrame): DataFrame =
    eff
      .groupBy(col("date"), col("entity_type"), col("feature_type"))
      .agg(
        count(lit(1)).as("total_count"),
        countIf(col("eff_sentiment") === "positive").as("positive_count"),
        countIf(col("eff_sentiment") === "neutral").as("neutral_count"),
        countIf(col("eff_sentiment") === "negative").as("negative_count"))

  /** `serp_feature_control_daily_index_mv`. */
  def serpFeatureControlDailyIndex(items: DataFrame, itemOverrides: DataFrame,
      urlOverrides: DataFrame): DataFrame =
    serpFeatureControlDailyIndexFromEffective(
      featureItemsEffective(items, itemOverrides, urlOverrides))

  def serpFeatureControlDailyIndexFromEffective(eff: DataFrame): DataFrame =
    eff
      .groupBy(col("date"), col("entity_type"), col("feature_type"))
      .agg(
        countIf(col("eff_control").isNotNull).as("total_count"),
        countIf(col("eff_control") === "controlled").as("controlled_count"))

  /** `negative_articles_summary_mv` (`sql/negative_summary_mv.sql:1-49`):
    * brand+ceo union at mention grain, then negative/crisis counts and the
    * top-3-alphabetical negative headlines. NULL (not "") when a group has
    * no negative titles — matches `array_to_string(NULL)` in the reference. */
  def negativeSummary(
      companyMentionsDaily: DataFrame,
      ceoMentionsDaily: DataFrame,
      companyMentions: DataFrame,
      ceoMentions: DataFrame,
      companies: DataFrame,
      ceos: DataFrame,
      articles: DataFrame,
      companyOverrides: DataFrame,
      ceoOverrides: DataFrame): DataFrame = {
    val art = broadcast(articles.select(col("id").as("aid"), col("title")))
    val brand = companyMentionsDaily
      .join(companyMentions.select(col("company_id").as("m_cid"),
        col("article_id").as("m_aid"), col("llm_risk_label")),
        col("company_id") === col("m_cid") && col("article_id") === col("m_aid"))
      .join(broadcast(companies.select(col("id"), col("name"))), col("company_id") === col("id"))
      .join(art, col("article_id") === col("aid"))
      .join(broadcast(companyOverrides.select(col("company_id").as("ov_cid"),
        col("article_id").as("ov_aid"), col("override_sentiment_label"))),
        col("company_id") === col("ov_cid") && col("article_id") === col("ov_aid"), "left")
      .select(col("date"), col("id").as("company_id_out"), col("name").as("company"),
        lit("").as("ceo"),
        coalesce(col("override_sentiment_label"), col("sentiment_label")).as("sentiment"),
        col("title"), col("llm_risk_label"), lit("brand").as("article_type"))

    val ceo = ceoMentionsDaily
      .join(ceoMentions.select(col("ceo_id").as("m_ceoid"),
        col("article_id").as("m_aid"), col("llm_risk_label")),
        col("ceo_id") === col("m_ceoid") && col("article_id") === col("m_aid"))
      .join(broadcast(ceos.select(col("id"), col("name").as("ceo_name"),
        col("company_id").as("ceo_company_id"))), col("ceo_id") === col("id"))
      .join(broadcast(companies.select(col("id").as("cid"), col("name").as("company_name"))),
        col("ceo_company_id") === col("cid"))
      .join(art, col("article_id") === col("aid"))
      .join(broadcast(ceoOverrides.select(col("ceo_id").as("ov_ceoid"),
        col("article_id").as("ov_aid"), col("override_sentiment_label"))),
        col("ceo_id") === col("ov_ceoid") && col("article_id") === col("ov_aid"), "left")
      .select(col("date"), col("cid").as("company_id_out"), col("company_name").as("company"),
        coalesce(col("ceo_name"), lit("")).as("ceo"),
        coalesce(col("override_sentiment_label"), col("sentiment_label")).as("sentiment"),
        col("title"), col("llm_risk_label"), lit("ceo").as("article_type"))

    brand.unionByName(ceo)
      .groupBy(col("date"), col("company_id_out").as("company_id"), col("company"),
        col("ceo"), col("article_type"))
      .agg(
        countIf(col("sentiment") === "negative").as("negative_count"),
        countIf(col("llm_risk_label") === "crisis_risk").as("crisis_risk_count"),
        when(countIf(col("sentiment") === "negative") > 0,
          array_join(slice(sort_array(collect_list(
            when(col("sentiment") === "negative", col("title")))), 1, 3), " | "))
          .as("top_headlines"))
  }
}
