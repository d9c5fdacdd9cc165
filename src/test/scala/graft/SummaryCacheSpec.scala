package graft

import java.sql.{Date, Timestamp}

import graft.api.SummaryCache
import org.apache.spark.sql.functions._

/** serp_feature_summaries read-through cache (app.py:5740-5838): item
  * selection order/limit, the exact prompt text format (app.py:236-261),
  * cache-hit probe, and the conflict-update column set. */
class SummaryCacheSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)
  private def ts(s: String) = Timestamp.valueOf(s)

  test("prompt format matches build_serp_feature_summary_prompt") {
    val (system, user) = SummaryCache.buildPrompt("company", "Acme Corp", "top_stories_items",
      Seq(
        ("Acme fraud probe", "Reuters", "https://r.example/x"),
        ("Acme expands", "", "https://n.example/y"),
        ("", "", "https://only-url.example/z"),
        ("", "", "")))
    assert(system == "You summarize SERP feature results for internal users. " +
      "Write exactly one concise sentence. No preamble, no leading entity name.")
    assert(user ==
      "Entity: company = Acme Corp\n" +
        "Feature: top_stories_items\n" +
        "Items:\n" +
        "- Acme fraud probe (Reuters)\n" +
        "- Acme expands\n" +
        "- https://only-url.example/z\n" +
        "Return summary only.")
  }

  test("item selection: position nulls last then title, limited") {
    val items = Seq(
      (d("2025-06-01"), "brand", "c1", "top_stories_items", Some(2), "B title", "", "u2"),
      (d("2025-06-01"), "brand", "c1", "top_stories_items", None, "Z no-pos", "", "u4"),
      (d("2025-06-01"), "brand", "c1", "top_stories_items", Some(1), "A title", "", "u1"),
      (d("2025-06-01"), "brand", "c1", "top_stories_items", None, "A no-pos", "", "u3"),
      (d("2025-06-01"), "ceo", "c1", "top_stories_items", Some(0), "wrong type", "", "u5"),
      (d("2025-06-02"), "brand", "c1", "top_stories_items", Some(0), "wrong day", "", "u6")
    ).toDF("date", "entity_type", "entity_id", "feature_type", "position", "title",
      "snippet", "url").withColumn("source", lit("src"))

    val got = SummaryCache.itemsForSummary(items, lit(d("2025-06-01")),
      Seq("brand", "company"), lit("c1"), lit("top_stories_items"), limit = 3)
      .select("title").as[String].collect()
    assert(got.toSeq == Seq("A title", "B title", "A no-pos"))
  }

  test("read-through upsert: overwrite summary columns, keep entity_name") {
    val cache = Seq(
      (d("2025-06-01"), "company", "c1", "Acme", "top_stories_items",
        "old summary", "openai", "gpt-old", ts("2025-06-01 10:00:00"))
    ).toDF("date", "entity_type", "entity_id", "entity_name", "feature_type",
      "summary_text", "provider", "model", "updated_at")
    val fresh = Seq(
      (d("2025-06-01"), "company", "c1", "RENAMED", "top_stories_items",
        "new summary", "gemini", "g-2", ts("2025-06-02 09:00:00")),
      (d("2025-06-01"), "company", "c2", "Globex", "top_stories_items",
        "globex summary", "gemini", "g-2", ts("2025-06-02 09:00:00"))
    ).toDF("date", "entity_type", "entity_id", "entity_name", "feature_type",
      "summary_text", "provider", "model", "updated_at")

    val merged = SummaryCache.upsert(cache, fresh)
    val byId = merged.orderBy("entity_id")
      .select("entity_id", "entity_name", "summary_text", "provider", "model")
      .as[(String, String, String, String, String)].collect()
    // conflict row: summary columns overwritten, entity_name NOT updated
    assert(byId(0) == (("c1", "Acme", "new summary", "gemini", "g-2")))
    assert(byId(1) == (("c2", "Globex", "globex summary", "gemini", "g-2")))

    val hit = SummaryCache.lookup(merged, lit(d("2025-06-01")), lit("company"),
      lit("c1"), lit("top_stories_items"))
      .as[(String, String, String, Timestamp)].collect()
    assert(hit.toSeq == Seq(("new summary", "gemini", "g-2", ts("2025-06-02 09:00:00"))))
  }
}
