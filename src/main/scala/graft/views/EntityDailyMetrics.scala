package graft.views

import graft.operators.Rollups.countIf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `entity_daily_metrics_v` (`sql/entity_daily_metrics_v.sql:1-167`) — the
  * heaviest read in the reference: union-of-keys over four metric sources,
  * five left joins back, every metric coalesced to 0.
  *
  * The inputs here are already-aggregated gold tables (one row per entity ×
  * day), so the join legs are all keyed identically on (date, entity_type,
  * entity_id): Spark shuffles each leg once on that key and AQE coalesces
  * the exchanges; there is no raw-fact shuffle in this view. (The raw-fact
  * crunch happened in the Gold builders.)
  */
object EntityDailyMetrics {

  /** article_crisis CTE (`entity_daily_metrics_v.sql:33-57`): crisis-risk
    * label counts from the mention grain. */
  def articleCrisis(
      companyMentionsDaily: DataFrame,
      ceoMentionsDaily: DataFrame,
      companyMentions: DataFrame,
      ceoMentions: DataFrame,
      ceos: DataFrame): DataFrame = {
    val brand = companyMentionsDaily
      .join(companyMentions.select(col("company_id").as("m_cid"),
        col("article_id").as("m_aid"), col("llm_risk_label")),
        col("company_id") === col("m_cid") && col("article_id") === col("m_aid"), "left")
      .groupBy(col("date"), col("company_id"))
      .agg(countIf(col("llm_risk_label") === "crisis_risk").as("crisis_risk_count"))
      .select(col("date"), lit("brand").as("entity_type"),
        col("company_id").as("entity_id"), col("company_id"),
        lit(null: String).as("ceo_id"), col("crisis_risk_count"))
    val ceo = ceoMentionsDaily
      .join(broadcast(ceos.select(col("id"), col("company_id").as("ceo_company_id"))),
        col("ceo_id") === col("id"))
      .join(ceoMentions.select(col("ceo_id").as("m_ceoid"),
        col("article_id").as("m_aid"), col("llm_risk_label")),
        col("ceo_id") === col("m_ceoid") && col("article_id") === col("m_aid"), "left")
      .groupBy(col("date"), col("ceo_company_id"), col("ceo_id"))
      .agg(countIf(col("llm_risk_label") === "crisis_risk").as("crisis_risk_count"))
      .select(col("date"), lit("ceo").as("entity_type"), col("ceo_id").as("entity_id"),
        col("ceo_company_id").as("company_id"), col("ceo_id"), col("crisis_risk_count"))
    brand.unionByName(ceo)
  }

  /** top_stories CTEs (`entity_daily_metrics_v.sql:59-121`): re-aggregate the
    * feature MVs at brand/ceo grain for feature_type = top_stories_items. */
  def topStoriesSentiment(serpFeatureDaily: DataFrame, companies: DataFrame,
      ceos: DataFrame): DataFrame = {
    val fd = serpFeatureDaily.filter(col("feature_type") === "top_stories_items")
      .withColumn("norm_entity_type",
        when(col("entity_type").isin("brand", "company"), "brand").otherwise("ceo"))
    fd.join(broadcast(companies.select(col("id").as("cb_id"), col("name").as("cb_name"))),
        col("norm_entity_type") === "brand" && col("entity_id") === col("cb_id"), "left")
      .join(broadcast(ceos.select(col("id").as("ce_id"), col("name").as("ce_name"),
        col("company_id").as("ce_company_id"))),
        col("norm_entity_type") === "ceo" && col("entity_id") === col("ce_id"), "left")
      .join(broadcast(companies.select(col("id").as("cc_id"), col("name").as("cc_name"))),
        col("ce_company_id") === col("cc_id"), "left")
      .withColumn("company_id",
        when(col("norm_entity_type") === "brand", col("entity_id"))
          .otherwise(col("ce_company_id")))
      .withColumn("ceo_id",
        when(col("norm_entity_type") === "ceo", col("entity_id")))
      .withColumn("company",
        coalesce(col("cb_name"), col("cc_name"), col("entity_name")))
      .withColumn("ceo",
        when(col("norm_entity_type") === "ceo",
          coalesce(col("ce_name"), col("entity_name"))).otherwise(lit("")))
      .withColumn("out_entity_name",
        coalesce(when(col("norm_entity_type") === "ceo", col("ce_name"))
          .otherwise(col("cb_name")), col("entity_name")))
      .groupBy(col("date"), col("norm_entity_type").as("entity_type"), col("entity_id"),
        col("company_id"), col("ceo_id"), col("company"), col("ceo"),
        col("out_entity_name").as("entity_name"))
      .agg(
        sum(col("total_count")).as("top_stories_total_count"),
        sum(col("positive_count")).as("top_stories_positive_count"),
        sum(col("neutral_count")).as("top_stories_neutral_count"),
        sum(col("negative_count")).as("top_stories_negative_count"))
  }

  def topStoriesControl(serpFeatureControlDaily: DataFrame): DataFrame =
    serpFeatureControlDaily.filter(col("feature_type") === "top_stories_items")
      .withColumn("norm_entity_type",
        when(col("entity_type").isin("brand", "company"), "brand").otherwise("ceo"))
      .groupBy(col("date"), col("norm_entity_type").as("entity_type"), col("entity_id"))
      .agg(sum(col("controlled_count")).as("top_stories_controlled_count"))

  /** The full view: key union + five left joins + coalesce-to-zero. */
  def build(
      articleDailyCounts: DataFrame,
      serpDailyCounts: DataFrame,
      articleCrisisDf: DataFrame,
      topStoriesSentimentDf: DataFrame,
      topStoriesControlDf: DataFrame): DataFrame = {
    val key = Seq("date", "entity_type", "entity_id")

    val a = articleDailyCounts.select(col("date"), col("entity_type"), col("entity_id"),
      col("company_id").as("a_company_id"), col("ceo_id").as("a_ceo_id"),
      col("entity_name").as("a_entity_name"), col("company").as("a_company"),
      col("ceo").as("a_ceo"),
      col("positive").as("article_positive_count"),
      col("neutral").as("article_neutral_count"),
      col("negative").as("article_negative_count"),
      col("total").as("article_total_count"),
      col("neg_pct").as("article_negative_pct"))

    val s = serpDailyCounts.select(col("date"), col("entity_type"), col("entity_id"),
      col("company_id").as("s_company_id"), col("ceo_id").as("s_ceo_id"),
      col("entity_name").as("s_entity_name"), col("company").as("s_company"),
      col("ceo").as("s_ceo"),
      col("positive_serp").as("serp_positive_count"),
      col("neutral_serp").as("serp_neutral_count"),
      col("negative_serp").as("serp_negative_count"),
      col("total").as("serp_total_count"),
      col("controlled").as("serp_controlled_count"),
      greatest(col("total") - col("controlled"), lit(0)).as("serp_uncontrolled_count"))

    val ac = articleCrisisDf.select(col("date"), col("entity_type"), col("entity_id"),
      col("company_id").as("ac_company_id"), col("ceo_id").as("ac_ceo_id"),
      col("crisis_risk_count"))

    val ts = topStoriesSentimentDf.select(col("date"), col("entity_type"), col("entity_id"),
      col("company_id").as("ts_company_id"), col("ceo_id").as("ts_ceo_id"),
      col("entity_name").as("ts_entity_name"), col("company").as("ts_company"),
      col("ceo").as("ts_ceo"),
      col("top_stories_total_count"), col("top_stories_positive_count"),
      col("top_stories_neutral_count"), col("top_stories_negative_count"))

    val tc = topStoriesControlDf.select(col("date"), col("entity_type"), col("entity_id"),
      col("top_stories_controlled_count"))

    val keys = a.select(key.map(col): _*)
      .union(s.select(key.map(col): _*))
      .union(ac.select(key.map(col): _*))
      .union(ts.select(key.map(col): _*))
      .distinct()

    keys
      .join(a, key, "left").join(s, key, "left").join(ac, key, "left")
      .join(ts, key, "left").join(tc, key, "left")
      .select(
        col("date"), col("entity_type"), col("entity_id"),
        coalesce(col("a_company_id"), col("s_company_id"), col("ac_company_id"),
          col("ts_company_id")).as("company_id"),
        coalesce(col("a_ceo_id"), col("s_ceo_id"), col("ac_ceo_id"), col("ts_ceo_id"))
          .as("ceo_id"),
        coalesce(nullif(col("a_entity_name"), lit("")), nullif(col("s_entity_name"), lit("")),
          nullif(col("ts_entity_name"), lit("")), lit("")).as("entity_name"),
        coalesce(nullif(col("a_company"), lit("")), nullif(col("s_company"), lit("")),
          nullif(col("ts_company"), lit("")), lit("")).as("company"),
        coalesce(nullif(col("a_ceo"), lit("")), nullif(col("s_ceo"), lit("")),
          nullif(col("ts_ceo"), lit("")), lit("")).as("ceo"),
        coalesce(col("article_positive_count"), lit(0L)).as("article_positive_count"),
        coalesce(col("article_neutral_count"), lit(0L)).as("article_neutral_count"),
        coalesce(col("article_negative_count"), lit(0L)).as("article_negative_count"),
        coalesce(col("article_total_count"), lit(0L)).as("article_total_count"),
        coalesce(col("article_negative_pct"), lit(0).cast("decimal(38,6)"))
          .as("article_negative_pct"),
        coalesce(col("serp_positive_count"), lit(0L)).as("serp_positive_count"),
        coalesce(col("serp_neutral_count"), lit(0L)).as("serp_neutral_count"),
        coalesce(col("serp_negative_count"), lit(0L)).as("serp_negative_count"),
        coalesce(col("serp_total_count"), lit(0L)).as("serp_total_count"),
        coalesce(col("serp_controlled_count"), lit(0L)).as("serp_controlled_count"),
        coalesce(col("serp_uncontrolled_count"), lit(0L)).as("serp_uncontrolled_count"),
        coalesce(col("top_stories_total_count"), lit(0L)).as("top_stories_total_count"),
        coalesce(col("top_stories_positive_count"), lit(0L)).as("top_stories_positive_count"),
        coalesce(col("top_stories_neutral_count"), lit(0L)).as("top_stories_neutral_count"),
        coalesce(col("top_stories_negative_count"), lit(0L)).as("top_stories_negative_count"),
        coalesce(col("top_stories_controlled_count"), lit(0L)).as("top_stories_controlled_count"),
        greatest(coalesce(col("top_stories_total_count"), lit(0L)) -
          coalesce(col("top_stories_controlled_count"), lit(0L)), lit(0L))
          .as("top_stories_uncontrolled_count"),
        coalesce(col("crisis_risk_count"), lit(0L)).as("crisis_risk_count"))
  }
}
