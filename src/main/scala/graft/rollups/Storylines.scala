package graft.rollups

import graft.functions.NarrativeRules
import graft.operators.Windows
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K7: the storyline candidate builder + `find_storylines` selection
  * (reference `dashboard_app/app.py:1968-2211, 4978-5080`).
  *
  * The reference builds three dict families in one Python pass — (sector,
  * tag), (tag), (sector) — then scores typed headline templates. Here each
  * family is a distributed aggregation over the shared normalized row set:
  * consecutive-day durations via gaps-and-islands episodes, top-3 samples
  * via in-group rank windows, and the headline/angle/why strings as column
  * concats (float renderings match Python's str() for the involved shapes).
  * The final selection (one candidate per preferred type, then score-order
  * fill) is relational over the tiny candidate set — no driver collect.
  */
object Storylines {

  /** `normalized_narrative_group` (`app.py:1898-1909`): well-formed group,
    * else vocabulary, else is_crisis, else NULL (unknown labels die here —
    * unlike the aggregate_crisis_patterns inline variant which keeps them). */
  private def normalizedGroup: Column = {
    val g = lower(trim(coalesce(col("narrative_primary_group"), lit(""))))
    val tag = trim(coalesce(col("narrative_primary_tag"), lit("")))
    when(g.isin("crisis", "non_crisis"), g)
      .when(tag.isin(NarrativeRules.NonCrisisTags: _*), "non_crisis")
      .when(col("narrative_is_crisis") === true, "crisis")
      .when(col("narrative_is_crisis") === false, "non_crisis")
      .otherwise(lit(null).cast("string"))
  }

  private def displayTag(tag: Column, grp: Column): Column =
    when(coalesce(grp, lit("")) === "non_crisis" ||
      tag.isin(NarrativeRules.NonCrisisTags: _*),
      concat(tag, lit(" (non-crisis)"))).otherwise(tag)

  /** Shared normalization for all three bucket families. */
  private def prepare(narrativeRows: DataFrame): DataFrame =
    narrativeRows
      .withColumn("__tag", trim(coalesce(col("narrative_primary_tag"), lit(""))))
      .filter(col("__tag") =!= "")
      .filter(col("date").isNotNull)
      .withColumn("__grp", normalizedGroup)
      .withColumn("__sector",
        when(trim(coalesce(col("sector"), lit(""))) === "", "Unspecified")
          .otherwise(trim(col("sector"))))
      .withColumn("__tag_key",
        concat(lower(col("__tag")), lit("::"), coalesce(col("__grp"), lit(""))))
      .withColumn("__display", displayTag(col("__tag"), col("__grp")))
      .withColumn("__neg", coalesce(col("negative_item_count").cast("long"), lit(0L)))

  /** `find_storylines`' pre-filter (`app.py:5009-5020`). */
  def filterNonCrisis(narrativeRows: DataFrame, includeNonCrisis: Boolean): DataFrame =
    if (includeNonCrisis) narrativeRows
    else narrativeRows.filter(
      !(normalizedGroup <=> lit("non_crisis")))

  private def durationStats(base: DataFrame, keys: Seq[String]): DataFrame = {
    val entityDays = base.select((keys :+ "entity_id" :+ "date").map(col): _*).distinct()
    Windows.episodes(entityDays, keys :+ "entity_id", "date")
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("episode_count"),
        bround(avg(col("episode_days")), 2).as("avg_duration_days"),
        percentile(col("episode_days"), lit(0.5)).as("median_duration_days"),
        max(col("episode_days")).as("max_duration_days"))
  }

  /** Top-3 entity names per group by (negative total desc, name casefold). */
  private def sampleEntities(base: DataFrame, keys: Seq[String]): DataFrame = {
    val perEntity = base.groupBy((keys :+ "entity_id").map(col): _*)
      .agg(sum(col("__neg")).as("__etotal"), max(col("entity_name")).as("__ename"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__etotal").desc, lower(col("__ename")))
    perEntity.withColumn("__r", row_number().over(w)).filter(col("__r") <= 3)
      .groupBy(keys.map(col): _*)
      .agg(transform(array_sort(collect_list(struct(col("__r"), col("__ename")))),
        s => s.getField("__ename")).as("sample_entities"))
  }

  private val candidateCols = Seq(
    "storyline_key", "storyline_type", "headline", "angle", "why_interesting",
    "score", "entities_affected", "sectors_affected", "avg_duration_days",
    "median_duration_days", "max_duration_days", "episode_count",
    "total_negative_items", "active_days", "sector", "display_tag",
    "dominant_tags", "sample_entities", "sample_sectors")

  /** The flattened candidate schema (the reference nests
    * `supporting_metrics`; columns absent for a storyline type are null). */
  def storylineCandidates(
      narrativeRows: DataFrame, analyticsType: String = "brand"): DataFrame = {
    val base = graft.Caching.track(prepare(narrativeRows))
    val plural = if (analyticsType == "brand") "brands" else "CEOs"
    val dbl = (c: Column) => c.cast("double").cast("string")

    // --------------------------- family 1: (sector, tag) (app.py:2063-2107)
    val stKeys = Seq("__sector", "__tag_key")
    val st = base.groupBy(stKeys.map(col): _*)
      .agg(
        max(col("__tag")).as("tag"), max(col("__display")).as("display_tag"),
        countDistinct(col("entity_id")).as("entities_affected"),
        countDistinct(col("date")).as("active_days"),
        sum(col("__neg")).as("total_negative_items"))
      .join(durationStats(base, stKeys), stKeys)
      .join(sampleEntities(base, stKeys), stKeys)
      .select(
        concat(lit("sector_tag:"), col("__sector"), lit(":"), lower(col("tag")))
          .as("storyline_key"),
        lit("sector_tag_pattern").as("storyline_type"),
        concat(col("__sector"), lit(" saw concentrated "),
          lower(col("display_tag")), lit(" pressure")).as("headline"),
        concat(col("entities_affected"), lit(s" $plural in "), col("__sector"),
          lit(" showed "), col("display_tag"),
          lit(" in negative search/news coverage during the selected window."))
          .as("angle"),
        concat(lit("Average duration was "), dbl(col("avg_duration_days")),
          lit(" days, with a maximum streak of "), col("max_duration_days"),
          lit(" days and "), col("total_negative_items"),
          lit(" tagged negative evidence items.")).as("why_interesting"),
        bround(col("entities_affected") * 6 + col("total_negative_items") * 0.35 +
          col("avg_duration_days") * 2 + col("active_days") * 0.4, 2).as("score"),
        col("entities_affected"), lit(null).cast("long").as("sectors_affected"),
        col("avg_duration_days"), lit(null).cast("double").as("median_duration_days"),
        col("max_duration_days"), col("episode_count"), col("total_negative_items"),
        col("active_days"), col("__sector").as("sector"), col("display_tag"),
        lit(null).cast("array<string>").as("dominant_tags"),
        col("sample_entities"), array(col("__sector")).as("sample_sectors"))

    // ------------------------------- family 2: cross-sector (app.py:2109-2159)
    val tKeys = Seq("__tag_key")
    val perSector = base.groupBy(col("__tag_key"), col("__sector"))
      .agg(sum(col("__neg")).as("__stotal"))
    val wS = Window.partitionBy(col("__tag_key"))
      .orderBy(col("__stotal").desc, lower(col("__sector")))
    val topSectors = perSector.withColumn("__r", row_number().over(wS))
      .filter(col("__r") <= 3)
      .groupBy(col("__tag_key"))
      .agg(transform(array_sort(collect_list(struct(col("__r"), col("__sector")))),
        s => s.getField("__sector")).as("sample_sectors"))
    val ct = base.groupBy(tKeys.map(col): _*)
      .agg(
        max(col("__tag")).as("tag"), max(col("__display")).as("display_tag"),
        countDistinct(col("__sector")).as("sectors_affected"),
        countDistinct(col("entity_id")).as("entities_affected"),
        sum(col("__neg")).as("total_negative_items"))
      .filter(col("sectors_affected") >= 2)
      .join(durationStats(base, tKeys), tKeys)
      .join(sampleEntities(base, tKeys), tKeys)
      .join(topSectors, tKeys)
      .select(
        concat(lit("cross_sector:"), lower(col("tag"))).as("storyline_key"),
        lit("cross_sector_narrative").as("storyline_type"),
        concat(col("display_tag"), lit(" crossed sector lines")).as("headline"),
        concat(lit("The "), col("display_tag"), lit(" narrative appeared across "),
          col("sectors_affected"), lit(" sectors and "), col("entities_affected"),
          lit(s" $plural in the selected window.")).as("angle"),
        concat(lit("It persisted for "), dbl(col("avg_duration_days")),
          lit(" days on average, peaked at "), col("max_duration_days"),
          lit(" days, and generated "), col("total_negative_items"),
          lit(" tagged negative evidence items.")).as("why_interesting"),
        bround(col("sectors_affected") * 7 + col("entities_affected") * 4 +
          col("avg_duration_days") * 1.6 + col("total_negative_items") * 0.25, 2)
          .as("score"),
        col("entities_affected"), col("sectors_affected"),
        col("avg_duration_days"), lit(null).cast("double").as("median_duration_days"),
        col("max_duration_days"), col("episode_count"), col("total_negative_items"),
        lit(null).cast("long").as("active_days"),
        lit(null).cast("string").as("sector"), col("display_tag"),
        lit(null).cast("array<string>").as("dominant_tags"),
        col("sample_entities"), col("sample_sectors"))

    // --------------------------------- family 3: (sector) (app.py:2161-2209)
    val sKeys = Seq("__sector")
    val perTag = base.groupBy(col("__sector"), col("__display"))
      .agg(sum(col("__neg")).as("__ttotal"))
    val wT = Window.partitionBy(col("__sector"))
      .orderBy(col("__ttotal").desc, lower(col("__display")))
    val topTags = perTag.withColumn("__r", row_number().over(wT))
      .filter(col("__r") <= 3)
      .groupBy(col("__sector"))
      .agg(transform(array_sort(collect_list(struct(col("__r"), col("__display")))),
        s => s.getField("__display")).as("dominant_tags"))
    val sd = base.groupBy(sKeys.map(col): _*)
      .agg(
        countDistinct(col("entity_id")).as("entities_affected"),
        sum(col("__neg")).as("total_negative_items"))
      .join(durationStats(base, sKeys), sKeys)
      .join(sampleEntities(base, sKeys), sKeys)
      .join(topTags, sKeys)
      .select(
        concat(lit("sector_duration:"), col("__sector")).as("storyline_key"),
        lit("sector_duration_outlier").as("storyline_type"),
        concat(col("__sector"), lit(" crises lingered in search")).as("headline"),
        concat(col("__sector"),
          lit(" showed one of the more persistent search-visible crisis patterns for "),
          col("entities_affected"), lit(s" $plural in the selected window."))
          .as("angle"),
        concat(lit("Average duration was "), dbl(col("avg_duration_days")),
          lit(" days, the median episode lasted "), dbl(col("median_duration_days")),
          lit(" days, and the strongest themes were "),
          coalesce(nullif(array_join(slice(col("dominant_tags"), 1, 2), ", "), lit("")),
            lit("mixed")),
          lit(".")).as("why_interesting"),
        bround(col("avg_duration_days") * 3 + col("entities_affected") * 3 +
          col("total_negative_items") * 0.18, 2).as("score"),
        col("entities_affected"), lit(null).cast("long").as("sectors_affected"),
        col("avg_duration_days"), col("median_duration_days"),
        col("max_duration_days"), col("episode_count"), col("total_negative_items"),
        lit(null).cast("long").as("active_days"),
        col("__sector").as("sector"), lit(null).cast("string").as("display_tag"),
        col("dominant_tags"), col("sample_entities"),
        array(col("__sector")).as("sample_sectors"))

    st.unionByName(ct).unionByName(sd)
  }

  /** `find_storylines` selection (`app.py:5022-5057`): the best candidate of
    * each preferred type in preference order, then score-order fill — all
    * relational (the candidate set is tiny: sectors × tags upper bound). */
  def findStorylines(candidates: DataFrame, limit: Int = 3): DataFrame = {
    val lim = math.min(math.max(limit, 1), 10)
    val prio = when(col("storyline_type") === "cross_sector_narrative", 0)
      .when(col("storyline_type") === "sector_duration_outlier", 1)
      .otherwise(2)
    val wType = Window.partitionBy(col("storyline_type"))
      .orderBy(col("score").desc, lower(col("headline")))
    val preferred = candidates.withColumn("__rt", row_number().over(wType))
      .filter(col("__rt") === 1)
      .withColumn("__ord", prio)
      .orderBy(col("__ord")).limit(lim).drop("__rt")
    val fill = candidates
      .join(preferred.select(col("storyline_key").as("__pk")),
        col("storyline_key") === col("__pk"), "left_anti")
      // the reference's selected_keys set also dedupes WITHIN the fill:
      // of same-key candidates the first in (-score, headline) order wins
      .withColumn("__kr", row_number().over(
        Window.partitionBy(col("storyline_key"))
          .orderBy(col("score").desc, lower(col("headline")))))
      .filter(col("__kr") === 1).drop("__kr")
      // one brand-day's fill candidates (reference readout grain) —
      // bounded domain, single partition intentional
      .withColumn("__fr", row_number().over(
        Window.partitionBy(lit(0))
          .orderBy(col("score").desc, lower(col("headline")))))
      .withColumn("__ord", col("__fr") + 2)
      .drop("__fr")
    preferred.unionByName(fill)
      .orderBy(col("__ord")).limit(lim)
      .drop("__ord")
  }
}
