package graft.api

import graft.sinks.MergeWriter
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `serp_feature_summaries` read-through LLM-summary cache (reference
  * `sql/schema.sql:434-450`, endpoint `dashboard_app/app.py:5740-5838`):
  * one summary row per (date, entity_type, entity_id, feature_type), served
  * from cache unless absent/refresh, regenerated from the day's ordered
  * top-N feature items, upserted with plain-overwrite conflict semantics.
  *
  * The LLM call itself is out of engine scope (reference: HTTP to a
  * provider, S13) — it enters as a caller-supplied `summarize` function over
  * the built prompt; everything around it (item selection + ordering +
  * limit, prompt assembly, cache lookup, upsert) is the engine's job and is
  * implemented here exactly per the reference.
  */
object SummaryCache {

  val DefaultSummaryItems = 12 // LLM_SUMMARY_ITEMS default (app.py:66)

  /** The day's items feeding one summary: `ORDER BY position NULLS LAST,
    * title LIMIT n` (`app.py:5788-5799`). `entityTypes` carries the
    * brand/company aliasing (P2). */
  def itemsForSummary(
      serpFeatureItems: DataFrame,
      date: Column,
      entityTypes: Seq[String],
      entityId: Column,
      featureType: Column,
      limit: Int = DefaultSummaryItems): DataFrame =
    serpFeatureItems
      .filter(col("date") === date && col("entity_type").isin(entityTypes: _*) &&
        col("entity_id") === entityId && col("feature_type") === featureType)
      .orderBy(col("position").asc_nulls_last, col("title"))
      .limit(limit)
      .select("title", "snippet", "source", "url")

  /** `build_serp_feature_summary_prompt` (`app.py:236-261`): item line is
    * "- title (source)" / "- title" / "- url", first non-empty wins. */
  def buildPrompt(
      entityType: String,
      entityName: String,
      featureType: String,
      items: Seq[(String, String, String)]): (String, String) = {
    val system =
      "You summarize SERP feature results for internal users. " +
        "Write exactly one concise sentence. " +
        "No preamble, no leading entity name."
    val lines = items.flatMap { case (titleRaw, sourceRaw, urlRaw) =>
      val title = Option(titleRaw).getOrElse("").trim
      val source = Option(sourceRaw).getOrElse("").trim
      val url = Option(urlRaw).getOrElse("").trim
      if (title.nonEmpty && source.nonEmpty) Some(s"- $title ($source)")
      else if (title.nonEmpty) Some(s"- $title")
      else if (url.nonEmpty) Some(s"- $url")
      else None
    }
    val user =
      s"Entity: $entityType = $entityName\n" +
        s"Feature: $featureType\n" +
        s"Items:\n${lines.mkString("\n")}\n" +
        "Return summary only."
    (system, user)
  }

  /** Cache lookup: the exact-key probe the endpoint issues before
    * generating (`app.py:5768-5786`). */
  def lookup(
      cache: DataFrame,
      date: Column,
      entityType: Column,
      entityId: Column,
      featureType: Column): DataFrame =
    cache.filter(col("date") === date && col("entity_type") === entityType &&
      col("entity_id") === entityId && col("feature_type") === featureType)
      .select("summary_text", "provider", "model", "updated_at")

  /** Upsert freshly generated summaries: `on conflict (date, entity_type,
    * entity_id, feature_type) do update set summary_text/provider/model,
    * updated_at = now()` (`app.py:5820-5831`). `newRows` must carry the full
    * cache schema (entity_name travels with the insert). */
  def upsert(cache: DataFrame, newRows: DataFrame): DataFrame =
    // entity_name is NOT in the reference's update list — it keeps the
    // existing value on conflict (only inserts carry it), which is the
    // MergeSpec default for unlisted columns
    MergeWriter.merge(cache, newRows, MergeWriter.MergeSpec(
      keys = Seq("date", "entity_type", "entity_id", "feature_type"),
      overwrite = Seq("summary_text", "provider", "model", "updated_at")))
}
