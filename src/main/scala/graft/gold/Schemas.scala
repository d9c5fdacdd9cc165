package graft.gold

import org.apache.spark.sql.types._

/** Explicit StructTypes for the reference data model (`sql/schema.sql`,
  * column inventory in SURVEY.md §1.2-1.3). Facts NEVER use schema
  * inference; uuid -> canonical-form string, numeric -> DecimalType where
  * exactness is compared (pcts), timestamptz -> TimestampType (session UTC).
  */
object Schemas {

  val companies: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("ticker", StringType),
    StructField("sector", StringType),
    StructField("websites", StringType),
    StructField("favorite", BooleanType)))

  val ceos: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("company_id", StringType),
    StructField("alias", StringType),
    StructField("favorite", BooleanType)))

  val articles: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("canonical_url", StringType),
    StructField("title", StringType),
    StructField("publisher", StringType),
    StructField("snippet", StringType),
    StructField("published_at", TimestampType),
    StructField("first_seen_at", TimestampType),
    StructField("last_seen_at", TimestampType),
    StructField("source", StringType)))

  val companyArticleMentions: StructType = StructType(Seq(
    StructField("company_id", StringType, nullable = false),
    StructField("article_id", StringType, nullable = false),
    StructField("sentiment_label", StringType),
    StructField("control_class", StringType),
    StructField("finance_routine", BooleanType),
    StructField("uncertain", BooleanType),
    StructField("llm_sentiment_label", StringType),
    StructField("llm_risk_label", StringType),
    StructField("llm_control_class", StringType),
    StructField("llm_severity", StringType)))

  val ceoArticleMentions: StructType = StructType(Seq(
    StructField("ceo_id", StringType, nullable = false),
    StructField("article_id", StringType, nullable = false),
    StructField("sentiment_label", StringType),
    StructField("control_class", StringType),
    StructField("finance_routine", BooleanType),
    StructField("uncertain", BooleanType),
    StructField("llm_sentiment_label", StringType),
    StructField("llm_risk_label", StringType),
    StructField("llm_control_class", StringType),
    StructField("llm_severity", StringType)))

  val companyArticleMentionsDaily: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("company_id", StringType, nullable = false),
    StructField("article_id", StringType, nullable = false),
    StructField("sentiment_label", StringType),
    StructField("control_class", StringType),
    StructField("finance_routine", BooleanType),
    StructField("uncertain", BooleanType)))

  val ceoArticleMentionsDaily: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("ceo_id", StringType, nullable = false),
    StructField("article_id", StringType, nullable = false),
    StructField("sentiment_label", StringType),
    StructField("control_class", StringType),
    StructField("finance_routine", BooleanType),
    StructField("uncertain", BooleanType)))

  val companyArticleOverrides: StructType = StructType(Seq(
    StructField("company_id", StringType, nullable = false),
    StructField("article_id", StringType, nullable = false),
    StructField("override_sentiment_label", StringType),
    StructField("override_relevant", BooleanType),
    StructField("override_control_class", StringType),
    StructField("note", StringType),
    StructField("edited_by", StringType),
    StructField("edited_at", TimestampType)))

  val ceoArticleOverrides: StructType = StructType(Seq(
    StructField("ceo_id", StringType, nullable = false),
    StructField("article_id", StringType, nullable = false),
    StructField("override_sentiment_label", StringType),
    StructField("override_relevant", BooleanType),
    StructField("override_control_class", StringType),
    StructField("note", StringType),
    StructField("edited_by", StringType),
    StructField("edited_at", TimestampType)))

  val serpRuns: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("entity_type", StringType, nullable = false),
    StructField("company_id", StringType),
    StructField("ceo_id", StringType),
    StructField("query_text", StringType),
    StructField("provider", StringType),
    StructField("run_at", TimestampType)))

  val serpResults: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("serp_run_id", StringType, nullable = false),
    StructField("rank", IntegerType),
    StructField("url", StringType),
    StructField("url_hash", StringType),
    StructField("title", StringType),
    StructField("snippet", StringType),
    StructField("domain", StringType),
    StructField("published_date", DateType),
    StructField("sentiment_label", StringType),
    StructField("control_class", StringType),
    StructField("finance_routine", BooleanType),
    StructField("llm_sentiment_label", StringType),
    StructField("llm_risk_label", StringType),
    StructField("llm_control_class", StringType)))

  val serpResultOverrides: StructType = StructType(Seq(
    StructField("serp_result_id", StringType, nullable = false),
    StructField("override_sentiment_label", StringType),
    StructField("override_control_class", StringType),
    StructField("note", StringType),
    StructField("edited_by", StringType),
    StructField("edited_at", TimestampType)))

  val serpFeatureItems: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("entity_type", StringType, nullable = false),
    StructField("entity_id", StringType, nullable = false),
    StructField("entity_name", StringType),
    StructField("feature_type", StringType, nullable = false),
    StructField("item_type", StringType),
    StructField("title", StringType),
    StructField("snippet", StringType),
    StructField("url", StringType),
    StructField("domain", StringType),
    StructField("published_date", DateType),
    StructField("position", IntegerType),
    StructField("url_hash", StringType),
    StructField("sentiment_label", StringType),
    StructField("llm_sentiment_label", StringType),
    StructField("llm_control_class", StringType),
    StructField("control_class", StringType),
    StructField("finance_routine", BooleanType),
    StructField("source", StringType)))

  val serpFeatureItemOverrides: StructType = StructType(Seq(
    StructField("serp_feature_item_id", StringType, nullable = false),
    StructField("override_sentiment_label", StringType),
    StructField("override_control_class", StringType),
    StructField("note", StringType),
    StructField("edited_by", StringType),
    StructField("edited_at", TimestampType)))

  val serpFeatureUrlOverrides: StructType = StructType(Seq(
    StructField("entity_type", StringType, nullable = false),
    StructField("entity_id", StringType, nullable = false),
    StructField("feature_type", StringType, nullable = false),
    StructField("url_hash", StringType, nullable = false),
    StructField("override_sentiment_label", StringType),
    StructField("override_control_class", StringType),
    StructField("edited_at", TimestampType)))
}
