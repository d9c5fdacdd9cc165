package graft

import java.nio.file.Files

import graft.gold.{GoldRefresh, GoldTables, Schemas}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Full gold-layer rebuild: all 7 MVs from one orchestrated pass (shared
  * persisted effective-items intermediate), written with dynamic partition
  * overwrite, equal to the individually-built (parity-proven) tables. */
class GoldRefreshSpec extends SparkSpec {

  private def fixture(name: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .json(getClass.getResource(s"/fixtures/$name.jsonl").getPath)

  private lazy val in = GoldRefresh.BronzeInputs(
    companies = fixture("companies", Schemas.companies),
    ceos = fixture("ceos", Schemas.ceos),
    articles = fixture("articles", Schemas.articles),
    companyMentions = fixture("company_article_mentions", Schemas.companyArticleMentions),
    ceoMentions = fixture("ceo_article_mentions", Schemas.ceoArticleMentions),
    companyMentionsDaily =
      fixture("company_article_mentions_daily", Schemas.companyArticleMentionsDaily),
    ceoMentionsDaily = fixture("ceo_article_mentions_daily", Schemas.ceoArticleMentionsDaily),
    companyArticleOverrides =
      fixture("company_article_overrides", Schemas.companyArticleOverrides),
    ceoArticleOverrides = fixture("ceo_article_overrides", Schemas.ceoArticleOverrides),
    serpRuns = fixture("serp_runs", Schemas.serpRuns),
    serpResults = fixture("serp_results", Schemas.serpResults),
    serpResultOverrides = fixture("serp_result_overrides", Schemas.serpResultOverrides),
    serpFeatureItems = fixture("serp_feature_items", Schemas.serpFeatureItems),
    serpFeatureItemOverrides =
      fixture("serp_feature_item_overrides", Schemas.serpFeatureItemOverrides),
    serpFeatureUrlOverrides =
      fixture("serp_feature_url_overrides", Schemas.serpFeatureUrlOverrides))

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.selectExpr(cols: _*).collect().map(_.toString).sorted.toSeq
  }

  test("rebuildAll emits all 7 gold tables, equal to the direct builders") {
    val rebuilt = GoldRefresh.rebuildAll(in).toMap
    assert(rebuilt.keySet == Set(
      "serp_feature_daily", "serp_feature_control_daily", "serp_feature_daily_index",
      "serp_feature_control_daily_index", "article_daily_counts", "serp_daily_counts",
      "negative_summary"))
    rebuilt.values.foreach(df => assert(df.count() > 0))
    // the shared-intermediate path must equal the standalone builders
    assert(canon(rebuilt("serp_feature_daily")) == canon(GoldTables.serpFeatureDaily(
      in.serpFeatureItems, in.serpFeatureItemOverrides, in.serpFeatureUrlOverrides)))
    assert(canon(rebuilt("serp_feature_control_daily_index")) ==
      canon(GoldTables.serpFeatureControlDailyIndex(
        in.serpFeatureItems, in.serpFeatureItemOverrides, in.serpFeatureUrlOverrides)))
  }

  test("refreshToParquet writes date-partitioned tables readable back intact") {
    val base = Files.createTempDirectory("graft-gold").toString
    val times = GoldRefresh.refreshToParquet(in, base)
    assert(times.map(_._1).toSet.size == 7)
    val back = spark.read.parquet(s"$base/article_daily_counts")
    assert(back.columns.contains("date")) // partition column restored
    assert(canon(back) == canon(GoldRefresh.rebuildAll(in).toMap.apply("article_daily_counts")))
  }
}
