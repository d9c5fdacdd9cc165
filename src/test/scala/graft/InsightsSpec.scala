package graft

import graft.api.{Insights, MarketData, SerpFeatures}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Differential parity for the insights/serp/market endpoint readers.
  * Goldens for the aggregation endpoints were produced by mirroring the
  * reference's own Python loops over a deterministic fixture
  * (tools/gen_insights_goldens.py — `consecutive_day_durations`, the
  * crisis-pattern/industry-duration bucketing, sector-baseline
  * rows/summary/peer, app.py:1602-4976); the readers here must reproduce
  * them row-for-row IN ORDER (the reference's sort decides which rows
  * survive the limit). */
class InsightsSpec extends SparkSpec {
  import spark.implicits._

  private def res(p: String): String = getClass.getResource(p).getPath

  private val narrativeSchema = StructType(Seq(
    StructField("date", DateType), StructField("company_id", StringType),
    StructField("entity_id", StringType), StructField("entity_name", StringType),
    StructField("company", StringType), StructField("ceo", StringType),
    StructField("sector", StringType),
    StructField("narrative_primary_tag", StringType),
    StructField("narrative_primary_group", StringType),
    StructField("narrative_is_crisis", BooleanType),
    StructField("negative_item_count", LongType)))

  private lazy val narrativeRows =
    spark.read.schema(narrativeSchema).json(res("/fixtures/narrative_rows.jsonl"))

  private val end = to_date(lit("2025-03-28"))

  /** ordered canonical strings: columns sorted by name, numerics at 9dp,
    * arrays as JSON — row ORDER preserved (ordering decides the limit). */
  private def canon(df: DataFrame, cols: Seq[String]): Seq[String] = {
    val casted = df.select(cols.sorted.map { c =>
      df.schema(c).dataType match {
        case DateType => date_format(col(c), "yyyy-MM-dd").as(c)
        case _: ArrayType => to_json(col(c)).as(c)
        case _: NumericType =>
          col(c).cast("decimal(38,9)").cast("string").as(c)
        case _ => col(c).cast("string").as(c)
      }
    }: _*)
    casted.collect().map(_.toSeq.map {
      case null => "∅"
      case s: String if s.matches("-?\\d+\\.\\d*0+") =>
        BigDecimal(s).underlying.stripTrailingZeros.toPlainString
      case v => v.toString
    }.mkString("|")).toSeq
  }

  private def golden(name: String): DataFrame =
    spark.read.json(res(s"/goldens/$name.jsonl"))

  private def assertParity(got: DataFrame, gold: DataFrame): Unit = {
    val cols = gold.columns.toSeq
    val g = canon(got, cols)
    val e = canon(gold, cols)
    assert(g == e, s"\ngot:\n${g.mkString("\n")}\nexp:\n${e.mkString("\n")}")
  }

  test("aggregate_crisis_patterns matches the reference loop (crisis only)") {
    assertParity(
      Insights.aggregateCrisisPatterns(narrativeRows, end),
      golden("insights_crisis_patterns"))
  }

  test("aggregate_crisis_patterns with include_non_crisis") {
    assertParity(
      Insights.aggregateCrisisPatterns(narrativeRows, end, includeNonCrisis = true),
      golden("insights_crisis_patterns_all"))
  }

  test("aggregate_industry_durations matches the reference loop") {
    assertParity(
      Insights.aggregateIndustryDurations(narrativeRows, end),
      golden("insights_industry_durations"))
  }

  private val metricsSchema = StructType(Seq(
    StructField("date", DateType), StructField("entity_type", StringType),
    StructField("entity_id", StringType), StructField("company_id", StringType),
    StructField("ceo_id", StringType), StructField("entity_name", StringType),
    StructField("company", StringType), StructField("ceo", StringType),
    StructField("top_stories_negative_count", LongType)))

  private lazy val sectorMetrics =
    spark.read.schema(metricsSchema).json(res("/fixtures/sector_metrics.jsonl"))
  private lazy val sectorCompanies =
    spark.read.schema(StructType(Seq(
      StructField("id", StringType), StructField("name", StringType),
      StructField("sector", StringType))))
      .json(res("/fixtures/sector_companies.jsonl"))

  private lazy val sbRows = Insights.sectorBaselineRows(
    sectorMetrics, sectorCompanies, "brand", "Tech",
    "top_stories_negative_count", days = 14)

  test("sector_baseline rows: window anchored at sector max date, NULLS FIRST order") {
    assertParity(sbRows, golden("insights_sector_baseline_rows"))
  }

  test("sector_baseline summary + peer rank/percentile") {
    assertParity(Insights.sectorBaselineSummary(sbRows),
      golden("insights_sector_baseline_summary"))
    val peerGold = golden("insights_sector_baseline_peer")
    val peer = Insights.sectorBaselinePeer(sbRows, "e1")
    assertParity(peer.select(peerGold.columns.map(col).toSeq: _*), peerGold)
  }

  test("resolve_insights_window: rolling default, calendar clamp, error ladder") {
    import java.time.LocalDate
    val latest = Some(LocalDate.parse("2025-03-28"))
    // rolling: days clamped, anchored at latest
    val r = Insights.resolveInsightsWindow(latest, daysParam = Some("10")).toOption.get
    assert(r.windowMode == "rolling" && r.days == 10 &&
      r.start == LocalDate.parse("2025-03-19") && r.end == LocalDate.parse("2025-03-28"))
    assert(Insights.resolveInsightsWindow(latest, daysParam = Some("9999"))
      .toOption.get.days == 365)
    assert(Insights.resolveInsightsWindow(latest, daysParam = Some("junk"))
      .toOption.get.days == 90)
    // calendar: end clamps to latest, days counted inclusively
    val c = Insights.resolveInsightsWindow(latest,
      startDateParam = Some("2025-03-20"), endDateParam = Some("2025-04-05")).toOption.get
    assert(c.windowMode == "calendar" && c.end == LocalDate.parse("2025-03-28") &&
      c.days == 9 && c.requestedEnd.contains("2025-04-05"))
    // error ladder
    assert(Insights.resolveInsightsWindow(None) == Left("no_data"))
    assert(Insights.resolveInsightsWindow(latest,
      startDateParam = Some("2025-03-20")).isLeft)
    assert(Insights.resolveInsightsWindow(latest,
      startDateParam = Some("2025-05-01"), endDateParam = Some("2025-05-02"))
      == Left("no_data"))
    assert(Insights.resolveInsightsWindow(latest,
      startDateParam = Some("2025-03-05"), endDateParam = Some("2025-03-01"))
      == Left("start_date must be on or before end_date"))
    assert(Insights.resolveInsightsWindow(latest,
      startDateParam = Some("bad"), endDateParam = Some("2025-03-01"))
      == Left("invalid date format (YYYY-MM-DD)"))
  }

  // --------------------------------------------------------- storylines

  test("K7 storyline candidates match the reference builder (all 3 families)") {
    val filtered = graft.rollups.Storylines.filterNonCrisis(narrativeRows, false)
    // storyline_key alone is not unique (same tag under group 'crisis' vs
    // group None collides, faithfully) — order by (key, score desc)
    val got = graft.rollups.Storylines.storylineCandidates(filtered, "brand")
      .orderBy(col("storyline_key"), col("score").desc)
    assertParity(got, golden("storyline_candidates"))
  }

  test("find_storylines selection: preferred types then score fill, in order") {
    val filtered = graft.rollups.Storylines.filterNonCrisis(narrativeRows, false)
    val cands = graft.rollups.Storylines.storylineCandidates(filtered, "brand")
    assertParity(graft.rollups.Storylines.findStorylines(cands, 3),
      golden("storyline_selection"))
    // with a larger limit the fill stage kicks in and stays deduped
    val five = graft.rollups.Storylines.findStorylines(cands, 5).collect()
    assert(five.length == 5)
    assert(five.map(_.getAs[String]("storyline_key")).distinct.length == 5)
  }

  // ------------------------------------------------------- serp features

  private lazy val serpDaily = Seq(
    ("2025-03-01", "brand", "c1", "Acme", "news", 5L, 1L, 2L, 2L),
    ("2025-03-01", "brand", "c2", "Globex", "news", 4L, 2L, 1L, 1L),
    ("2025-03-01", "company", "c1", "Acme", "videos", 3L, 1L, 1L, 1L),
    ("2025-03-02", "brand", "c1", "Acme", "news", 6L, 2L, 2L, 2L),
    ("2025-03-02", "ceo", "e9", "Jane Doe", "news", 2L, 0L, 1L, 1L))
    .toDF("date", "entity_type", "entity_id", "entity_name", "feature_type",
      "total_count", "positive_count", "neutral_count", "negative_count")
    .withColumn("date", to_date(col("date")))

  test("serp_features: compat entity types, exact date, name/feature filters") {
    val got = SerpFeatures.serpFeatures(serpDaily, "brand",
      onDate = Some("2025-03-01"))
    // brand ~ {brand, company}: three rows on the date, ceo row excluded
    assert(got.count() == 3)
    val acmeNews = SerpFeatures.serpFeatures(serpDaily, "brand",
      onDate = Some("2025-03-01"), entityName = Some("Acme"),
      featureType = Some("news")).collect()
    assert(acmeNews.length == 1 && acmeNews(0).getAs[Long]("total_count") == 5L)
  }

  test("serp_features index mode re-aggregates across entities") {
    val idx = serpDaily.groupBy("date", "entity_type", "feature_type")
      .agg(sum("total_count").as("total_count"),
        sum("positive_count").as("positive_count"),
        sum("neutral_count").as("neutral_count"),
        sum("negative_count").as("negative_count"))
    val got = SerpFeatures.serpFeaturesIndex(idx, "brand",
      onDate = Some("2025-03-01")).collect()
    // (news: 5+4) + (videos: 3) over brand+company, entity_name = 'Index'
    assert(got.length == 2)
    val news = got.find(_.getAs[String]("feature_type") == "news").get
    assert(news.getAs[Long]("total_count") == 9L)
    assert(news.getAs[String]("entity_name") == "Index")
  }

  test("serp_features ceo scope hops ceo -> company") {
    val ceos = Seq(("e9", "Jane Doe", "c1"), ("e8", "Bob", "c2"))
      .toDF("id", "name", "company_id")
    val got = SerpFeatures.serpFeatures(serpDaily, "ceo",
      onDate = Some("2025-03-02"), scopeCompanyIds = Some(Seq("c1")),
      ceos = Some(ceos)).collect()
    assert(got.length == 1 && got(0).getAs[String]("entity_name") == "Jane Doe")
    val none = SerpFeatures.serpFeatures(serpDaily, "ceo",
      onDate = Some("2025-03-02"), scopeCompanyIds = Some(Seq("c2")),
      ceos = Some(ceos))
    assert(none.count() == 0)
  }

  // --------------------------------------------------------- market data

  test("stock_data: snapshot-date fallback + history-derived changes") {
    // both snapshots on 03-10: the effective date is shared table-wide, so
    // an entity snapshotted earlier would drop out (reference behavior —
    // the fallback re-queries one exact as_of_date)
    val snaps = Seq(
      ("ACM", "Acme", "2025-03-10", 10.0, Some(1.5), None: Option[Double], "2025-03-10 09:00:00"),
      ("GLX", "Globex", "2025-03-10", 20.0, None: Option[Double], None: Option[Double], "2025-03-10 09:00:00"))
      .toDF("ticker", "company", "as_of_date", "opening_price",
        "daily_change_pct", "seven_day_change_pct", "last_updated")
      .withColumn("as_of_date", to_date(col("as_of_date")))
      .withColumn("last_updated", to_timestamp(col("last_updated")))
    val daily = (1 to 10).flatMap { d =>
      Seq(("ACM", "Acme", f"2025-03-$d%02d", 100.0 + d),
        ("GLX", "Globex", f"2025-03-$d%02d", 200.0 + 2 * d))
    }.toDF("ticker", "company", "date", "price")
      .withColumn("date", to_date(col("date")))
    val companies = Seq(("c1", "Acme"), ("c2", "Globex")).toDF("id", "name")

    // target 2025-03-12 has no snapshot -> falls back to latest (03-10);
    // ACM keeps its CSV daily change, GLX derives both from history
    val got = MarketData.stockData(snaps, daily, companies,
      to_date(lit("2025-03-12"))).collect()
    assert(got.length == 2)
    val acm = got.find(_.getAs[String]("ticker") == "ACM").get
    assert(acm.getAs[Double]("daily_change_pct") == 1.5)
    assert(acm.getAs[scala.collection.Seq[Double]]("price_history").length == 10)
    val glx = got.find(_.getAs[String]("ticker") == "GLX").get
    // last=220, prev=218 -> 2/218*100 ; prev7 = 206 -> 14/206*100
    assert(math.abs(glx.getAs[Double]("daily_change_pct") - 2.0 / 218.0 * 100.0) < 1e-12)
    assert(math.abs(glx.getAs[Double]("seven_day_change_pct") - 14.0 / 206.0 * 100.0) < 1e-12)

    // company scope by name resolution
    val scoped = MarketData.stockData(snaps, daily, companies,
      to_date(lit("2025-03-12")), scopeCompanyIds = Some(Seq("c1")))
    assert(scoped.collect().map(_.getAs[String]("ticker")).toSeq == Seq("ACM"))
  }

  test("preset store: list order, on-conflict upsert semantics, delete") {
    import graft.api.SignalWeights
    val presets = Seq(
      ("p1", "brands", "Zeta", """{"newsNegative":0.2}""", "ann", "ann", "2025-01-01 00:00:00", "2025-01-01 00:00:00"),
      ("p2", "ceos", "alpha", """{"newsNegative":0.3}""", "bob", "bob", "2025-01-02 00:00:00", "2025-01-02 00:00:00"))
      .toDF("id", "tab_id", "preset_name", "weights", "created_by", "updated_by",
        "created_at", "updated_at")

    // GET ordering: tab_id, lower(name), name; tab filter normalizes input
    val listed = SignalWeights.listPresets(presets).collect().map(_.getString(0))
    assert(listed.toSeq == Seq("p1", "p2"))
    assert(SignalWeights.listPresets(presets, Some("  CEOS ")).count() == 1)
    assert(SignalWeights.listPresets(presets, Some("bogus")).count() == 2) // '' -> no filter

    // upsert existing key: weights/updated_* replaced, id/created_* preserved
    val batch = Seq(
      ("pX", "brands", "Zeta", """{"newsNegative":0.5}""", "carol", "carol", "2025-02-01 00:00:00", "2025-02-01 00:00:00"),
      ("pY", "brands", "New One", """{"newsNegative":0.4}""", "carol", "carol", "2025-02-01 00:00:00", "2025-02-01 00:00:00"))
      .toDF("id", "tab_id", "preset_name", "weights", "created_by", "updated_by",
        "created_at", "updated_at")
    val merged = SignalWeights.upsertPreset(presets, batch)
    val zeta = merged.filter(col("preset_name") === "Zeta").collect()(0)
    assert(zeta.getAs[String]("id") == "p1")                    // preserved
    assert(zeta.getAs[String]("created_by") == "ann")           // preserved
    assert(zeta.getAs[String]("updated_by") == "carol")         // replaced
    assert(zeta.getAs[String]("weights").contains("0.5"))       // replaced
    assert(merged.filter(col("preset_name") === "New One").count() == 1) // inserted
    assert(merged.count() == 3)

    // delete by (tab, name) with normalization
    assert(SignalWeights.deletePreset(merged, "BRANDS", "  Zeta  ").count() == 2)

    // name normalization caps at 80 and collapses whitespace
    assert(SignalWeights.normalizePresetName("  a   b  ") == "a b")
    assert(SignalWeights.normalizePresetName("x" * 100).length == 80)
  }


  test("available dates + boards readers") {
    val camd = Seq(("c1", "2025-03-02"), ("c1", "2025-03-01"), ("c2", "2025-03-02"))
      .toDF("company_id", "date").withColumn("date", to_date(col("date")))
    val dates = MarketData.availableDates(camd).collect().map(_.getDate(0).toString)
    assert(dates.toSeq == Seq("2025-03-02", "2025-03-01"))

    val boards = Seq(("b1", "e1", "https://x/a", "x.com", "manual", null: String))
      .toDF("id", "ceo_id", "url", "domain", "source", "last_updated")
    val ceos = Seq(("e1", "Jane Doe", "c1")).toDF("id", "name", "company_id")
    val comps = Seq(("c1", "Acme")).toDF("id", "name")
    val got = MarketData.boards(boards, ceos, comps).collect()
    assert(got.length == 1 && got(0).getAs[String]("company") == "Acme")
    assert(MarketData.boards(boards, ceos, comps,
      scopeCompanyIds = Some(Seq("c9"))).count() == 0)
  }

  test("favorites: flip by name; ceo flavor disambiguates via company") {
    val comps = Seq(("c1", "Acme", false), ("c2", "Globex", false))
      .toDF("id", "name", "favorite")
    val flipped = MarketData.setCompanyFavorite(comps, "Acme", favorite = true)
    assert(flipped.filter(col("favorite")).collect().map(_.getString(1)).toSeq == Seq("Acme"))

    // two ceos share a name across companies; only the Acme one flips
    val ceos = Seq(("e1", "Jane Doe", "c1", false), ("e2", "Jane Doe", "c2", false))
      .toDF("id", "name", "company_id", "favorite")
    val f1 = MarketData.setCeoFavorite(ceos, comps, "Jane Doe", Some("Acme"), true)
    assert(f1.filter(col("favorite")).collect().map(_.getString(0)).toSeq == Seq("e1"))
    // without a company, both match (reference updates every row by name)
    val f2 = MarketData.setCeoFavorite(ceos, comps, "Jane Doe", None, true)
    assert(f2.filter(col("favorite")).count() == 2)
  }

  test("roster: company x ceo left join, coalesced optionals, (company, ceo) order") {
    val comps = Seq(
      ("c1", "Acme", "acme.com", "ACM", "Tech", true),
      ("c2", "Globex", null, null, null, null.asInstanceOf[Any]))
      .map(t => (t._1, t._2, t._3, t._4, t._5,
        Option(t._6).map(_.asInstanceOf[Boolean])))
      .toDF("id", "name", "websites", "ticker", "sector", "favorite")
    val ceos = Seq(("e1", "Jane Doe", "c1", null: String, false))
      .toDF("id", "name", "company_id", "alias", "favorite")
    val got = MarketData.roster(comps, ceos).collect()
    assert(got.length == 2)
    assert(got(0).getAs[String]("company") == "Acme" &&
      got(0).getAs[String]("ceo") == "Jane Doe" &&
      got(0).getAs[String]("ceo_alias") == "")
    // company without a ceo still appears (left join), optionals coalesced
    assert(got(1).getAs[String]("company") == "Globex" &&
      got(1).getAs[String]("stock") == "" &&
      !got(1).getAs[Boolean]("company_favorite"))
  }
}
