package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.ingest.{ArticlesIngest, MetricsIngest, RosterIngest}
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def writeCsv(content: String): String = {
    val f = Files.createTempFile("graft-ingest", ".csv")
    Files.writeString(f, content)
    f.toString
  }

  test("RosterIngest: header aliases, last-row-wins, ceo name resolution") {
    val path = writeCsv(
      """CEO,Company,CEO Alias,Websites,Stock,Sector,Favorite,CEO Favorite
        |Jane Doe,Acme Corp,J. Doe,acme.com|acme.io,ACM,Industrials,yes,no
        |John Smith,Globex,,globex.com,GLX,Tech,,1
        |Jane Doe,Acme Corp,Janey,acme.com,ACM,Industrials,no,yes
        |""".stripMargin)
    val roster = RosterIngest.readRosterCsv(spark, path)
    val comps = RosterIngest.companies(roster)
    val got = comps.select("name", "websites", "favorite")
      .as[(String, String, Boolean)].collect().map { case (k, v, f) => k -> ((v, f)) }.toMap
    // last Acme row wins: websites acme.com, favorite=no
    assert(got("Acme Corp") == (("acme.com", false)))
    assert(got("Globex") == (("globex.com", false)))

    val ceos = RosterIngest.ceos(roster, comps)
    val ceoGot = ceos.select("name", "alias", "favorite")
      .as[(String, String, Boolean)].collect().map { case (k, a, f) => k -> ((a, f)) }.toMap
    assert(ceoGot("Jane Doe") == (("Janey", true)))
    assert(ceoGot("John Smith") == (("", true)))
    // ids are deterministic and resolve across dims
    assert(ceos.join(comps, ceos("company_id") === comps("id")).count() == 2)
  }

  test("ArticlesIngest: canonicalization, dedupe-merge, derived labels") {
    val path = writeCsv(
      """company,title,url,source,snippet,sentiment,controlled,finance_routine,uncertain,llm_label,llm_severity,published_at
        |Acme Corp,Acme hit with lawsuit,https://www.news.com/a?utm_source=x,news.com,,negative,,,,,,2025-01-02T10:00:00
        |Acme Corp,Acme hit with lawsuit v2,https://news.com/a,news.com,,negative,false,,,,,
        |Acme Corp,Acme Q3 earnings beat,https://news.com/fin,news.com,,negative,,,,,,
        |Acme Corp,On acme.com itself,https://acme.com/press,Acme,,positive,,,,,,
        |Missing Co,Unknown company row,https://news.com/x,news.com,,neutral,,,,,,
        |""".stripMargin)
    val comps = Seq(("c1", "Acme Corp", "ACM", "Industrials", "acme.com", false))
      .toDF("id", "name", "ticker", "sector", "websites", "favorite")
    val raw = ArticlesIngest.readModalCsv(spark, path)
    val norm = ArticlesIngest.normalize(raw, "company", comps)

    // URL canonicalization folds the utm variant into the same canonical_url
    val arts = ArticlesIngest.articlesBatch(norm,
      lit(Timestamp.valueOf("2025-01-05 00:00:00")))
    val byUrl = arts.select("canonical_url", "title")
      .as[(String, String)].collect().toMap
    assert(byUrl("https://news.com/a") == "Acme hit with lawsuit v2") // last wins
    // first row's published_at survives the merge
    val pub = arts.filter(col("canonical_url") === "https://news.com/a")
      .select(col("published_at").cast("string")).as[String].head()
    assert(pub startsWith "2025-01-02")

    val mentions = ArticlesIngest.companyMentionsDaily(norm, lit("2025-01-05").cast("date"))
    val labels = norm.select("canonical_url", "sentiment", "control_class")
      .as[(String, String, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.head }.toMap
    // finance-routine negative without material-risk terms -> neutralized
    assert(labels("https://news.com/fin")._2 == "neutral")
    // company's own domain -> controlled (derived via K11)
    assert(labels("https://acme.com/press")._3 == "controlled")
    // lawsuit headline has material-risk terms -> stays negative
    assert(labels("https://news.com/a")._2 == "negative")
    // unresolvable company dropped from mentions but kept in articles
    assert(mentions.filter(col("article_id") === sha2(lit("https://news.com/x"), 256)).count() == 0)
  }

  test("ArticlesIngest.mergeArticles: coalesce-preserving min/max seen merge") {
    val existing = Seq(
      ("u1", "id1", "old title", "pub", null.asInstanceOf[String],
        Timestamp.valueOf("2025-01-01 00:00:00"), Timestamp.valueOf("2025-01-01 00:00:00"),
        Timestamp.valueOf("2025-01-03 00:00:00"), "google_rss"))
      .toDF("canonical_url", "id", "title", "publisher", "snippet",
        "published_at", "first_seen_at", "last_seen_at", "source")
    val batch = Seq(
      ("u1", "id1", "new title", null.asInstanceOf[String], null.asInstanceOf[String],
        null.asInstanceOf[Timestamp], Timestamp.valueOf("2025-01-05 00:00:00"),
        Timestamp.valueOf("2025-01-05 00:00:00"), "google_rss"),
      ("u2", "id2", "fresh", "p2", null.asInstanceOf[String],
        null.asInstanceOf[Timestamp], Timestamp.valueOf("2025-01-05 00:00:00"),
        Timestamp.valueOf("2025-01-05 00:00:00"), "google_rss"))
      .toDF("canonical_url", "id", "title", "publisher", "snippet",
        "published_at", "first_seen_at", "last_seen_at", "source")
    val merged = ArticlesIngest.mergeArticles(existing, batch)
    val r = merged.filter(col("canonical_url") === "u1")
      .select(col("title"), col("publisher"), col("published_at").cast("string"),
        col("first_seen_at").cast("string"), col("last_seen_at").cast("string"))
      .as[(String, String, String, String, String)].head()
    assert(r._1 == "new title")          // excluded wins when non-null
    assert(r._2 == "pub")                // preserved when excluded null
    assert(r._3.startsWith("2025-01-01")) // old published_at kept
    assert(r._4.startsWith("2025-01-01")) // min(first_seen)
    assert(r._5.startsWith("2025-01-05")) // max(last_seen)
    assert(merged.count() == 2)
  }

  test("MetricsIngest: pipe-series explode + snapshot change fallback") {
    val path = writeCsv(
      """ticker,company,opening_price,daily_change_pct,seven_day_change_pct,price_history,date_history,last_updated
        |ACM,Acme Corp,10.0,,,"10.0|10.5|11.0|12.0|11.5|11.0|12.5|13.2","2025-01-01|2025-01-02|2025-01-03|2025-01-04|2025-01-05|2025-01-06|2025-01-07|2025-01-08",2025-01-08T12:00:00
        |GLX,Globex,5.0,2.5,,"5.0|5.1","2025-01-07|2025-01-08",2025-01-08T12:00:00
        |""".stripMargin)
    val stock = MetricsIngest.readCsv(spark, path)
    val daily = MetricsIngest.stockDaily(stock)
    assert(daily.count() == 10)
    assert(daily.filter(col("ticker") === "ACM").count() == 8)
    val snaps = MetricsIngest.stockSnapshots(stock)
      .select("ticker", "daily_change_pct", "seven_day_change_pct")
      .as[(String, Option[Double], Option[Double])].collect().map {
        case (t, d, w) => t -> ((d, w)) }.toMap
    // ACM: computed from series tail: (13.2-12.5)/12.5*100, (13.2-10.0)/10.0*100
    assert(math.abs(snaps("ACM")._1.get - 5.6) < 1e-9)
    assert(math.abs(snaps("ACM")._2.get - 32.0) < 1e-9)
    // GLX: csv-provided daily change wins; series too short for 7d
    assert(snaps("GLX")._1.get == 2.5)
    assert(snaps("GLX")._2.isEmpty)
  }

  test("SerpIngest: runs + results with deterministic ids and rank dedup") {
    val path = writeCsv(
      """company,title,snippet,source,url,published_date,position,sentiment,controlled
        |Acme Corp,Result one,,site,https://www.site.com/a?utm_source=t,2025-01-05,1,negative,false
        |Acme Corp,Result two,,site,https://site.com/b,2025-01-05,2,neutral,true
        |Acme Corp,Result dup,,site,https://site.com/b,2025-01-05,2,positive,true
        |Nope Co,Unresolvable,,site,https://site.com/c,2025-01-05,3,neutral,
        |""".stripMargin)
    val comps = Seq(("c1", "Acme Corp", "ACM", "Industrials", "acme.com", false))
      .toDF("id", "name", "ticker", "sector", "websites", "favorite")
    val ceos = Seq.empty[(String, String, String, String, Boolean)]
      .toDF("id", "name", "company_id", "alias", "favorite")
    val norm = graft.ingest.SerpIngest.normalize(
      graft.ingest.SerpIngest.readModalCsv(spark, path), "company", comps, ceos,
      lit("2025-01-05 06:00:00").cast("timestamp"))
    val runs = graft.ingest.SerpIngest.serpRuns(norm)
    assert(runs.count() == 1) // one run per entity per run_at
    val results = graft.ingest.SerpIngest.serpResults(norm)
    // dup (run, rank, url_hash) collapsed first-wins; unresolvable dropped
    assert(results.count() == 2)
    val r2 = results.filter(col("rank") === 2)
      .select("title", "sentiment_label").as[(String, String)].head()
    assert(r2 == (("Result two", "neutral")))
    // utm param stripped into canonical url but hash keys the raw-normalized form
    val r1 = results.filter(col("rank") === 1).select("url").as[String].head()
    assert(r1 == "https://site.com/a")
    // child rows join back to the run
    assert(results.join(runs.withColumnRenamed("id", "rid"),
      results("serp_run_id") === col("rid")).count() == 2)
  }

  test("RosterIngest.boards: name resolution + (ceo,url) last-wins dedup") {
    val rosterPath = writeCsv(
      """CEO,Company,CEO Alias,Websites,Stock,Sector,Favorite,CEO Favorite
        |Jane Doe,Acme Corp,,acme.com,ACM,Industrials,,
        |""".stripMargin)
    val roster = RosterIngest.readRosterCsv(spark, rosterPath)
    val comps = RosterIngest.companies(roster)
    val ceos = RosterIngest.ceos(roster, comps)
    val boardsPath = writeCsv(
      """CEO,Company,URL,Source,last_updated
        |Jane Doe,Acme Corp,https://www.boards.com/acme,manual,2025-01-01T00:00:00
        |Jane Doe,Acme Corp,https://www.boards.com/acme,crawler,2025-02-01T00:00:00
        |Jane Doe,Wrong Co,https://www.boards.com/x,manual,
        |""".stripMargin)
    val got = RosterIngest.boards(
      spark.read.option("header", "true").csv(boardsPath), comps, ceos)
      .select("url", "domain", "source").as[(String, String, String)].collect()
    assert(got.length == 1) // dup collapsed last-wins; unresolvable dropped
    assert(got(0) == (("https://www.boards.com/acme", "boards.com", "crawler")))
  }

  test("jsonl corpus: schema parse, corrupt-line quarantine, blank lines skipped") {
    import graft.sources.JsonlCorpus
    import org.apache.spark.sql.types._
    val p = Files.createTempFile("graft-jsonl", ".jsonl")
    Files.writeString(p,
      """{"doc_id": 1, "text": "hello world", "lang": "en"}
        |
        |{"doc_id": 2, "text": "zwei", "lang": "de", "extra": "ignored"}
        |not json at all
        |{"doc_id": 3, "text": "three"
        |{"doc_id": 4, "text": null, "lang": "fr"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val parsed = JsonlCorpus.parse(spark, p.toString, schema)
    assert(parsed.count() == 5) // blank line skipped

    val good = JsonlCorpus.documents(parsed)
      .as[(Long, Option[String], Option[String])].collect().sortBy(_._1).toSeq
    assert(good == Seq(
      (1L, Some("hello world"), Some("en")),
      (2L, Some("zwei"), Some("de")),   // unknown field ignored
      (4L, None, Some("fr"))))          // explicit null is data, not corruption
    assert(good.map(_._1) == Seq(1L, 2L, 4L))

    val bad = JsonlCorpus.quarantine(parsed).as[String].collect().sorted.toSeq
    assert(bad == Seq("not json at all", """{"doc_id": 3, "text": "three""""))

    // reserved corrupt-column name refused
    intercept[IllegalArgumentException](JsonlCorpus.parse(spark, p.toString,
      StructType(Seq(StructField("_raw", StringType)))))
  }
}
