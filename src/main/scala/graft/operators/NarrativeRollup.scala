package graft.operators

import graft.functions.NarrativeRules
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K3 `rollup_entity_day_narrative` (reference
  * `dashboard_app/narrative_runtime.py:448-548`) as a relational Spark
  * pipeline instead of a per-group Python loop:
  *
  *  1. classify each item (UDF over title/snippet/url/source, no Other
  *     fallback),
  *  2. per group: count candidates (negative, non-finance), tag histogram,
  *  3. gate: candidates >= min_negative_top_stories (default 2),
  *  4. primary tag = histogram max with the reference tie-break
  *     (count desc, crisis-group first, fixed tag order, casefolded name),
  *  5. `Other` fallback when gate met, nothing tagged, and unmatched >=
  *     other_min_support.
  *
  * Two map-side-combined shuffles — (keys, tag) then (keys) — with the
  * classify UDF evaluated exactly once per item; the tie-break is an
  * array_sort over each key's (small) tag histogram. Groups are SERP-page
  * bounded in the reference, so no skew concern; items are never collected.
  */
object NarrativeRollup {

  private val classifyUdf = udf(
    (title: String, snippet: String, url: String, source: String,
     sentiment: String, financeRoutine: java.lang.Boolean) => {
      val r = NarrativeRules.classifyNarrativeTags(
        title, Option(snippet).getOrElse(""), Option(url).getOrElse(""),
        Option(source).getOrElse(""), sentiment, financeRoutine,
        allowOtherFallback = false)
      r.primaryTag.orNull
    })

  /** Tie-break rank columns for a tag column (group rank, fixed order,
    * casefolded), built from the literal tag tables. */
  private def groupRank(tag: Column): Column = {
    val groups = NarrativeRules.TagGroups
    val whenCrisis = groups.collect { case (t, "crisis") => t }.toSeq
    val whenNon = groups.collect { case (t, "non_crisis") => t }.toSeq
    when(tag.isin(whenCrisis: _*), 0)
      .when(tag.isin(whenNon: _*), 1)
      .otherwise(2)
  }

  private def tagOrder(tag: Column): Column =
    NarrativeRules.TagOrder.foldLeft(lit(999)) { case (acc, (t, i)) =>
      when(tag === t, i).otherwise(acc)
    }

  /** @param items  item-grain df with columns title, snippet, url, source,
    *               sentiment (string), finance_routine (boolean)
    * @param keys   group key columns (entity, date in the reference)
    * @return per-key rollup: gate_met, negative_item_count, tagged_item_count,
    *         unmatched_negative_items, primary_tag, primary_group, is_crisis,
    *         supporting_negative_items, rule_version
    */
  def rollupEntityDay(
      items: DataFrame,
      keys: Seq[String],
      minNegativeTopStories: Int = NarrativeRules.MinNegTopStories,
      otherMinSupport: Int = NarrativeRules.OtherMinSupport): DataFrame = {
    val keyCols = keys.map(col)
    val candidate = lower(trim(coalesce(col("sentiment"), lit("")))) === "negative" &&
      !coalesce(col("finance_routine"), lit(false))

    val classified = items.withColumn("__cand", candidate)
      .withColumn("__tag",
        when(col("__cand"),
          classifyUdf(col("title"), col("snippet"), col("url"), col("source"),
            col("sentiment"), col("finance_routine"))))

    // ONE linear pipeline — groupBy(keys, tag) then groupBy(keys) — instead
    // of separate day-count and histogram branches joined back together:
    // the branch shape re-evaluates the whole classify-UDF subplan per
    // branch (Spark shares no subplans without persistence) and needs a
    // window + join. Here the UDF runs exactly once per item, both shuffles
    // are map-side combined, and the reference tie-break (count desc,
    // crisis-group first, fixed tag order, casefolded name —
    // narrative_runtime.py:510-519,546) is an array_sort over the per-key
    // tag histogram structs (lexicographic struct compare; count negated
    // for descending).
    val byTag = classified
      .groupBy((keyCols :+ col("__tag")): _*)
      .agg(Rollups.countIf(col("__cand")).as("__cnt"))

    val perKey = byTag.groupBy(keyCols: _*).agg(
      sum(col("__cnt")).as("negative_item_count"),
      sum(when(col("__tag").isNotNull, col("__cnt")).otherwise(0L))
        .as("tagged_item_count"),
      sum(when(col("__tag").isNull, col("__cnt")).otherwise(0L))
        .as("unmatched_negative_items"),
      array_sort(collect_list(when(col("__tag").isNotNull && col("__cnt") > 0,
        struct((-col("__cnt")).as("nc"), groupRank(col("__tag")).as("g"),
          tagOrder(col("__tag")).as("o"), lower(col("__tag")).as("l"),
          col("__tag").as("tag"), col("__cnt").as("cnt"))))).as("__sorted"))

    val gate = col("negative_item_count") >= math.max(1, minNegativeTopStories)
    perKey
      .withColumn("__primary", get(col("__sorted"), lit(0)).getField("tag"))
      .withColumn("__primary_count", get(col("__sorted"), lit(0)).getField("cnt"))
      .withColumn("__tags", transform(col("__sorted"), x => x.getField("tag")))
      .withColumn("__tag_counts", map_from_entries(
        transform(col("__sorted"), x => struct(x.getField("tag"), x.getField("cnt")))))
      .withColumn("gate_met", gate)
      .withColumn("primary_tag",
        when(!gate, lit(null: String))
          .when(col("__primary").isNotNull, col("__primary"))
          .when(col("unmatched_negative_items") >= math.max(1, otherMinSupport), lit("Other")))
      .withColumn("primary_group",
        when(col("primary_tag").isNull, lit(null: String))
          .when(groupRank(col("primary_tag")) === 0, lit("crisis"))
          .otherwise(lit("non_crisis")))
      .withColumn("is_crisis",
        when(col("primary_tag").isNull, lit(null: java.lang.Boolean))
          .otherwise(col("primary_group") === "crisis"))
      .withColumn("supporting_negative_items",
        when(!gate, lit(0L))
          .when(col("__primary").isNotNull, col("__primary_count"))
          .when(col("primary_tag") === "Other", col("unmatched_negative_items"))
          .otherwise(lit(0L)))
      .withColumn("tagged_item_count", when(gate, col("tagged_item_count")).otherwise(lit(0L)))
      // gate failure counts every candidate as unmatched (reference
      // narrative_runtime.py:487-501 resets item results wholesale)
      .withColumn("unmatched_negative_items",
        when(gate, col("unmatched_negative_items")).otherwise(col("negative_item_count")))
      .withColumn("tags",
        when(!gate, array().cast("array<string>"))
          .when(size(col("__tags")) > 0, col("__tags"))
          .when(col("primary_tag") === "Other", array(lit("Other")))
          .otherwise(array().cast("array<string>")))
      .withColumn("tag_counts",
        when(gate, coalesce(col("__tag_counts"),
          map().cast("map<string,bigint>"))).otherwise(map().cast("map<string,bigint>")))
      .withColumn("rule_version", lit(NarrativeRules.RuleVersion))
      .drop("__primary", "__primary_count", "__tags", "__tag_counts", "__sorted")
  }
}
