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

  test("override refresh: incremental == full rebuild, untouched partitions' files unmodified") {
    import org.apache.spark.sql.functions._
    import graft.gold.OverrideRefresh

    val base = Files.createTempDirectory("graft-ovr").toString
    GoldRefresh.refreshToParquet(in, base)

    // pick a real item to override: flip its sentiment on its date
    val item = in.serpFeatureItems
      .select(col("id"), col("date")).orderBy("id").limit(1).collect()(0)
    val itemId = item.getString(0)
    val touchedDate = item.getDate(1)
    val newOverride = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row.fromSeq(
        Schemas.serpFeatureItemOverrides.fields.map(_.name).map {
          case "serp_feature_item_id" => itemId
          case "override_sentiment_label" => "negative"
          case _ => null
        }.toSeq))),
      Schemas.serpFeatureItemOverrides)
    val withOverride = in.copy(serpFeatureItemOverrides =
      in.serpFeatureItemOverrides
        .filter(col("serp_feature_item_id") =!= itemId)
        .unionByName(newOverride))

    // snapshot file states of an affected table before the incremental pass
    def fileStates(table: String): Map[String, Long] = {
      val dir = new java.io.File(s"$base/$table")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(dir).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = fileStates("serp_feature_daily")
    val beforeArticle = fileStates("article_daily_counts")

    val times = OverrideRefresh.refreshAfterOverride(
      withOverride, base, "serp_feature_item", Seq(touchedDate))
    assert(times.map(_._1) == OverrideRefresh.Dependencies("serp_feature_item"))

    // every affected table equals a FULL rebuild with the new override
    val full = GoldRefresh.rebuildAll(withOverride).toMap
    for (t <- OverrideRefresh.Dependencies("serp_feature_item"))
      assert(canon(spark.read.parquet(s"$base/$t")) == canon(full(t)), s"table $t diverged")

    // untouched DATE partitions of the affected table: files unmodified
    val after = fileStates("serp_feature_daily")
    val touchedPrefix = s"date=$touchedDate"
    val untouchedBefore = before.filterNot(_._1.contains(touchedPrefix))
    untouchedBefore.foreach { case (path, mtime) =>
      assert(after.get(path).contains(mtime), s"untouched partition file rewritten: $path")
    }
    // and the touched partition WAS rewritten (new part-file names)
    assert(after.keySet.filter(_.contains(touchedPrefix)) !=
      before.keySet.filter(_.contains(touchedPrefix)),
      "touched partition must be rewritten")

    // unaffected tables: no file touched at all
    assert(fileStates("article_daily_counts") == beforeArticle,
      "article_daily_counts is not downstream of serp_feature_item")
  }
}
