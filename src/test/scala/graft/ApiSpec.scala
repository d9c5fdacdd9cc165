package graft

import graft.api.Api
import graft.gold.{GoldTables, Schemas}
import graft.views.{EntityAnomalies, EntityDailyMetrics}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** API layer over the same reference-schema fixtures used by GoldParitySpec. */
class ApiSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .json(getClass.getResource(s"/fixtures/$name.jsonl").getPath)

  private lazy val companies = fixture("companies", Schemas.companies)
  private lazy val ceos = fixture("ceos", Schemas.ceos)
  private lazy val camd = fixture("company_article_mentions_daily", Schemas.companyArticleMentionsDaily)
  private lazy val ceamd = fixture("ceo_article_mentions_daily", Schemas.ceoArticleMentionsDaily)
  private lazy val cam = fixture("company_article_mentions", Schemas.companyArticleMentions)
  private lazy val ceam = fixture("ceo_article_mentions", Schemas.ceoArticleMentions)
  private lazy val cao = fixture("company_article_overrides", Schemas.companyArticleOverrides)
  private lazy val ceao = fixture("ceo_article_overrides", Schemas.ceoArticleOverrides)
  private lazy val serpRuns = fixture("serp_runs", Schemas.serpRuns)
  private lazy val serpResults = fixture("serp_results", Schemas.serpResults)
  private lazy val sro = fixture("serp_result_overrides", Schemas.serpResultOverrides)
  private lazy val sfi = fixture("serp_feature_items", Schemas.serpFeatureItems)
  private lazy val sfio = fixture("serp_feature_item_overrides", Schemas.serpFeatureItemOverrides)
  private lazy val sfuo = fixture("serp_feature_url_overrides", Schemas.serpFeatureUrlOverrides)

  private lazy val articleMv = GoldTables.articleDailyCounts(camd, ceamd, companies, ceos, cao, ceao)
  private lazy val featureMv = GoldTables.serpFeatureDaily(sfi, sfio, sfuo)
  private lazy val edm = EntityDailyMetrics.build(
    articleMv,
    GoldTables.serpDailyCounts(serpRuns, serpResults, sro, companies, ceos),
    EntityDailyMetrics.articleCrisis(camd, ceamd, cam, ceam, ceos),
    EntityDailyMetrics.topStoriesSentiment(featureMv, companies, ceos),
    EntityDailyMetrics.topStoriesControl(GoldTables.serpFeatureControlDaily(sfi, sfio, sfuo)))

  test("dailyCounts: brand aliasing, scope filter, (date, company) order") {
    // days clamps to SeriesMaxDays (365) per the reference guardrail, so
    // anchor asOf inside the fixture window
    val asOf = lit("2025-04-15").cast("date")
    val all = Api.dailyCounts(articleMv, "brand", 100000, asOf = asOf)
    assert(all.select("entity_type").distinct().as[String].collect().toSet == Set("brand"))
    val scoped = Api.dailyCounts(articleMv, "brand", 100000, Some(Seq("c1")), asOf = asOf)
    assert(scoped.select("company_id").distinct().as[String].collect().toSeq == Seq("c1"))
    val dates = all.select(col("date").cast("string")).as[String].collect()
    assert(dates.sameElements(dates.sorted))
  }

  test("screen: window aggregate with having + composite order + limit") {
    val got = Api.screen(edm, companies, "article_negative_count", "brand",
      lit("2025-03-01").cast("date"), lit("2025-04-14").cast("date"),
      minTotal = 1, limit = 2)
    val rows = got.select("entity_id", "window_value", "signal_days").collect()
    assert(rows.length <= 2)
    assert(rows.nonEmpty)
    // descending by window_value
    val wv = rows.map(_.getLong(1))
    assert(wv.sameElements(wv.sortBy(-_)))
    // sector filter excludes non-matching
    val tech = Api.screen(edm, companies, "article_negative_count", "brand",
      lit("2025-03-01").cast("date"), lit("2025-04-14").cast("date"),
      sectorContains = Some("tech"), limit = 10)
    assert(tech.select("sector").distinct().as[String].collect().forall(_.toLowerCase.contains("tech")))
  }

  test("trendSummary: 7-vs-prior-7 windows, deltas, impact label domain") {
    val got = Api.trendSummary(edm, "brand", "c1")
    assert(got.count() == 1)
    val r = got.collect()(0)
    val cur = r.getAs[Long]("article_negative_count_7d")
    val prior = r.getAs[Long]("article_negative_count_prior_7d")
    assert(r.getAs[Long]("article_negative_count_delta") == cur - prior)
    val label = r.getAs[String]("search_impact")
    assert(Set("news_and_search_negative", "search_negative",
      "news_and_search_uncontrolled", "search_uncontrolled", "news_only", "muted")
      .contains(label))
  }

  test("anomalies + serpFeatureSeries filters") {
    val an = EntityAnomalies.build(edm)
    val got = Api.anomalies(an, "brand", "c2", days = 180, limit = 5,
      asOf = lit("2025-04-14").cast("date"))
    assert(got.count() <= 5)
    val series = Api.serpFeatureSeries(featureMv, "brand", "acme corporation",
      Seq("top_stories_items"), days = 365, asOf = lit("2025-04-14").cast("date"))
    assert(series.select("feature_type").distinct().as[String].collect().toSeq ==
      Seq("top_stories_items"))
    assert(series.count() > 0)
  }

  test("endpoint guardrails: reference clamp semantics") {
    import graft.api.ApiLimits._
    assert(clampLimit(0, ScreenMaxLimit) == 1)
    assert(clampLimit(-5, AnomaliesMaxLimit) == 1)
    assert(clampLimit(99999, ArticlesMaxLimit) == 1000)
    assert(clampLimit(99999, FeatureItemsMaxLimit) == 500)
    assert(clampLimit(99999, AnomaliesMaxLimit) == 200)
    assert(clampLimit(99999, ScreenMaxLimit) == 100)
    assert(clampOffset(-3) == 0 && clampOffset(7) == 7)
    assert(clampDays(0, SeriesMaxDays) == 1)
    assert(clampDays(9999, SeriesMaxDays) == 365)
    assert(clampDays(9999, TrendMaxDays) == 180)
    assert(clampDays(9999, ScreenMaxDays) == 90)
  }

  test("evidence: A10 dedup keeps highest sort_weight, ordered and capped") {
    val rows = Seq(
      ("2025-05-02", "article", "T1", "u1", 5L),
      ("2025-05-02", "article", "T1", "u1", 9L), // same key, higher weight wins
      ("2025-05-02", "top_stories", "T1", "u1", 3L), // different evidence_type
      ("2025-05-01", "article", "T2", "u2", 7L),
      ("2025-04-01", "article", "old", "u3", 9L) // outside window
    ).toDF("ds", "evidence_type", "title", "url", "sort_weight")
      .withColumn("date", col("ds").cast("date")).drop("ds")
    val got = Api.evidence(rows, lit("2025-05-01").cast("date"),
      lit("2025-05-31").cast("date"), limit = 10)
      .select("date", "evidence_type", "title", "sort_weight")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("2025-05-02", "article", "T1", 9L),
      ("2025-05-02", "top_stories", "T1", 3L),
      ("2025-05-01", "article", "T2", 7L)))
  }

  test("narrative overlay: five-pass selection order then chronological page") {
    val w = Seq(
      // (display_tag, start, end, duration, neg, active_on_end)
      ("Fraud", "2025-01-05", "2025-01-09", 5, 10, false),
      ("Legal", "2025-01-01", "2025-01-10", 10, 3, false),
      ("Breach", "2025-02-01", "2025-02-03", 3, 50, true), // active wins all
      ("Labor", "2025-01-02", "2025-01-11", 10, 4, false) // same dur as Legal, later end
    ).toDF("display_tag", "start_date", "end_date", "duration_days",
      "negative_item_count", "active_on_end_date")
    // selection order: Breach (active), Labor (dur 10, end 01-11),
    // Legal (dur 10, end 01-10), Fraud -> limit 3 drops Fraud;
    // page re-sorted chronologically by start
    val got = Api.narrativeOverlayWindows(w, limit = 3)
      .select("display_tag").as[String].collect()
    assert(got.toSeq == Seq("Legal", "Labor", "Breach"))
  }

  test("processedArticles: (entity_name, title) pagination with caps") {
    val rows = Seq(
      ("2025-05-01", "brand", "Acme", "B title"),
      ("2025-05-01", "brand", "Acme", "A title"),
      ("2025-05-01", "brand", "Zeta", "C title"),
      ("2025-05-01", "ceo", "Jane", "X title"),
      ("2025-05-02", "brand", "Acme", "other day")
    ).toDF("ds", "entity_type", "entity_name", "title")
      .withColumn("date", col("ds").cast("date")).drop("ds")
    val got = Api.processedArticles(rows, lit("2025-05-01").cast("date"),
      "brand", limit = 2, offset = 1)
      .select("entity_name", "title").as[(String, String)].collect()
    assert(got.toSeq == Seq(("Acme", "B title"), ("Zeta", "C title")))
  }

  test("narrativeTimeline: weighted buckets, group votes, trailing streak") {
    import java.sql.Date
    def row(ds: String, primary: String, group: String, tags: Seq[String],
        counts: Map[String, Long], crisis: Boolean) =
      (Date.valueOf(ds), primary, group, tags, counts, crisis)
    val rows = Seq(
      // Fraud active 06-03..06-05 (streak 3), also seen 06-01 (gap)
      row("2025-06-01", "Fraud", "crisis", Seq("Fraud"), Map("Fraud" -> 2L), true),
      row("2025-06-03", "Fraud", "crisis", Seq("Fraud", "Legal & Regulatory"),
        Map("Fraud" -> 3L, "Legal & Regulatory" -> 1L), true),
      row("2025-06-04", "Fraud", "crisis", Seq("Fraud"), Map("Fraud" -> 1L), true),
      row("2025-06-05", "Fraud", "crisis", Seq("Fraud"), Map("Fraud" -> 4L), true),
      // M&A non-crisis on the target day only
      row("2025-06-05", "Mergers and acquisitions", "non_crisis",
        Seq("Mergers and acquisitions"), Map("Mergers and acquisitions" -> 1L), false)
    ).toDF("date", "primary_tag", "primary_group", "tags", "tag_counts", "is_crisis")

    val got = Api.narrativeTimeline(rows, Date.valueOf("2025-06-05"), 30)
      .select("tag", "display_tag", "group", "active_on_date",
        "current_duration_days", "mentions_on_date", "mentions_total",
        "days_present", "current_start_date")
      .collect()
    val byTag = got.map(r => r.getString(0) -> r).toMap

    val fraud = byTag("Fraud")
    assert(fraud.getString(2) == "crisis" && fraud.getBoolean(3))
    assert(fraud.getInt(4) == 3) // streak 06-03..05, gap breaks 06-01
    assert(fraud.getLong(5) == 4L && fraud.getLong(6) == 10L)
    assert(fraud.getLong(7) == 4L)
    assert(fraud.get(8).toString == "2025-06-03")

    val mna = byTag("Mergers and acquisitions")
    assert(mna.getString(1) == "Mergers and acquisitions (non-crisis)")
    assert(mna.getString(2) == "non_crisis" && mna.getInt(4) == 1)

    // Legal tag: secondary on 06-03 only — inactive, votes fall to is_crisis
    val legal = byTag("Legal & Regulatory")
    assert(!legal.getBoolean(3) && legal.getInt(4) == 0 && legal.getString(2) == "crisis")

    // sort: active first (Fraud streak 3 > M&A streak 1), inactive last
    assert(got.map(_.getString(0)).toSeq ==
      Seq("Fraud", "Mergers and acquisitions", "Legal & Regulatory"))
  }

  test("narrativeTags: modal primary, weight-sorted tags, presence flags") {
    import java.sql.Date
    val rows = Seq(
      // Acme: one crisis-event row
      (Date.valueOf("2025-06-05"), "Acme", "Fraud", "crisis",
        Seq("Fraud", "Legal & Regulatory"),
        Map("Fraud" -> 2L, "Legal & Regulatory" -> 5L), Option(true)),
      // Globex: multi-row (fallback grain) — M&A appears twice, Fraud once
      (Date.valueOf("2025-06-05"), "Globex", "Mergers and acquisitions", "non_crisis",
        Seq("Mergers and acquisitions"), Map("Mergers and acquisitions" -> 1L),
        Option(false)),
      (Date.valueOf("2025-06-05"), "Globex", "Mergers and acquisitions", "non_crisis",
        Seq("Mergers and acquisitions"), Map("Mergers and acquisitions" -> 1L),
        Option(false)),
      (Date.valueOf("2025-06-05"), "Globex", "Fraud", "crisis",
        Seq("Fraud"), Map("Fraud" -> 9L), Option(true)),
      // other day must be ignored
      (Date.valueOf("2025-06-04"), "Acme", "Other", "crisis",
        Seq("Other"), Map("Other" -> 1L), Option(true))
    ).toDF("date", "entity_name", "primary_tag", "primary_group", "tags",
      "tag_counts", "is_crisis")

    val got = Api.narrativeTags(rows, lit(Date.valueOf("2025-06-05")))
      .select("entity_name", "primary_tag", "primary_display_tag", "tags",
        "display_tags", "has_crisis", "has_non_crisis")
      .as[(String, String, String, Seq[String], Seq[String], Boolean, Boolean)]
      .collect()
    assert(got.map(_._1).toSeq == Seq("Acme", "Globex"))

    val acme = got(0)
    assert(acme._2 == "Fraud" && acme._3 == "Fraud")
    // Legal weight 5 beats Fraud 2
    assert(acme._4 == Seq("Legal & Regulatory", "Fraud"))
    assert(acme._6 && !acme._7)

    val globex = got(1)
    assert(globex._2 == "Mergers and acquisitions") // modal: 2 rows beat 1
    assert(globex._3 == "Mergers and acquisitions (non-crisis)")
    // weights: Fraud 9 beats M&A 1+1=2
    assert(globex._4 == Seq("Fraud", "Mergers and acquisitions"))
    assert(globex._5 == Seq("Fraud", "Mergers and acquisitions (non-crisis)"))
    assert(globex._6 && globex._7)
  }
}
