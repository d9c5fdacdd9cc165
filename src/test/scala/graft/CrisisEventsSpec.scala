package graft

import graft.rollups.CrisisEvents
import java.sql.Date
import org.apache.spark.sql.functions._

/** K5 trigger machine: scenario traced by hand against the reference
  * algorithm (crisis_event_rollups.py:560-722); evidence-rollup tags
  * verified against the reference's rollup_crisis_event_items outputs. */
class CrisisEventsSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("top_stories -> newsfeed_delta+continuation -> continuation-only -> inactive") {
    val metrics = Seq(
      ("2025-06-01", 1L, 4L, "0.25"),
      ("2025-06-02", 3L, 5L, "0.60"),
      ("2025-06-03", 2L, 4L, "0.50"),
      ("2025-06-04", 0L, 2L, "0.00"),
      ("2025-06-06", 2L, 2L, "0.90")
    ).toDF("ds", "article_negative_count", "article_total_count", "pct")
      .select(col("ds").cast("date").as("date"), lit("brand").as("entity_type"),
        lit("c1").as("entity_id"), lit("Acme").as("entity_name"),
        col("article_negative_count"), col("article_total_count"),
        col("pct").cast("decimal(38,6)").as("article_negative_pct"))

    def ev(rows: (String, String)*) = rows.toSeq
      .toDF("ds", "title")
      .select(col("ds").cast("date").as("date"), lit("brand").as("entity_type"),
        lit("c1").as("entity_id"), col("title"), lit("").as("snippet"),
        lit("").as("url"), lit("src").as("source"))

    val topStories = ev(
      ("2025-06-01", "Acme fraud scandal"),
      ("2025-06-01", "Acme fraud charges"))
    val recent = ev(
      ("2025-06-01", "Acme stock dips on fraud news"),
      ("2025-06-02", "Acme fraud lawsuit"),
      ("2025-06-02", "Acme probe widens"),
      ("2025-06-03", "Acme fraud update"),
      ("2025-06-03", "Acme scandal continues"),
      ("2025-06-06", "Acme fraud again"),
      ("2025-06-06", "Acme fraud anew"))

    val got = CrisisEvents.build(metrics, topStories, recent)
      .select(col("date").cast("string"), col("trigger_sources"), col("primary_tag"),
        col("negative_top_stories_count"), col("recent_negative_article_count"))
      .as[(String, Seq[String], String, Long, Long)]
      .collect().map(r => r._1 -> r).toMap

    // day 1: 2 neg top-stories -> top_stories trigger; Fraud tag
    assert(got("2025-06-01")._2 == Seq("top_stories"))
    assert(got("2025-06-01")._3 == "Fraud")
    assert(got("2025-06-01")._4 == 2 && got("2025-06-01")._5 == 1)
    // day 2: total 5 >= 5, pct delta 0.35 >= 0.20, neg delta 2 >= 2,
    // recent 2 >= 2 -> newsfeed_delta; prev active + pct .6 >= .5 ->
    // continued_coverage co-fires; tie-broken Legal & Regulatory primary
    assert(got("2025-06-02")._2 == Seq("newsfeed_delta", "continued_coverage"))
    assert(got("2025-06-02")._3 == "Legal & Regulatory")
    // day 3: no fresh trigger; continuation only (recent 2, pct .5)
    assert(got("2025-06-03")._2 == Seq("continued_coverage"))
    assert(got("2025-06-03")._3 == "Fraud")
    // day 4: no triggers -> inactive (absent)
    assert(!got.contains("2025-06-04"))
    // day 6: continuation conditions hold but chain broke on day 4/5 gap
    assert(!got.contains("2025-06-06"))
    assert(got.size == 3)
  }

  test("evidence dedup winner follows explicit source order, not plan order") {
    // two same-day top-stories rows with the SAME dedup key (same url) but
    // different titles/positions: the reference loads ORDER BY position
    // NULLS LAST, id and keeps the first occurrence — so position 1 must
    // win regardless of physical row order, and the surviving title drives
    // narrative classification.
    val metrics = Seq(("2025-06-01", 2L, 4L, "0.50"))
      .toDF("ds", "article_negative_count", "article_total_count", "pct")
      .select(col("ds").cast("date").as("date"), lit("brand").as("entity_type"),
        lit("c1").as("entity_id"), lit("Acme").as("entity_name"),
        col("article_negative_count"), col("article_total_count"),
        col("pct").cast("decimal(38,6)").as("article_negative_pct"))

    def tsRows(rows: (String, Int, String)*) = rows.toSeq
      .toDF("title", "position", "url")
      .select(lit(java.sql.Date.valueOf("2025-06-01")).as("date"),
        lit("brand").as("entity_type"), lit("c1").as("entity_id"),
        col("title"), lit("").as("snippet"), col("url"), lit("src").as("source"),
        col("position"))

    // reversed insertion order on purpose: position 2 row first
    val topStories = tsRows(
      ("Acme data breach exposes records", 2, "https://x.example/a"),
      ("Acme fraud scandal", 1, "https://x.example/a"),
      ("Acme fraud charges widen", 3, "https://x.example/b"))
    val empty = tsRows().limit(0)

    val got = CrisisEvents.build(metrics, topStories, empty,
      topStoriesOrder = Seq(col("position").asc_nulls_last))
      .select("primary_tag", "negative_top_stories_count").collect()
    // dedup keeps "Acme fraud scandal" (pos 1) + "Acme fraud charges widen"
    // -> Fraud x2 beats Data Breaches (whose row lost the dedup)
    assert(got.length == 1)
    assert(got(0).getString(0) == "Fraud")
    assert(got(0).getLong(1) == 3L) // raw pre-dedup count
  }
}
