package graft.agent

import java.time.LocalDate
import java.util.regex.Pattern

import graft.agent.PeriodParser._

/** K14: heuristic NL query planner (reference
  * `insights agent/query_planner.py:22-366`): regex intents -> a typed tool
  * plan over the engine's entry points (screen / storylines / sector
  * baseline / crisis patterns / durations / comparison). Driver-side
  * dispatcher; the tools map to graft.api functions.
  */
object QueryPlanner {

  case class ToolCall(name: String, arguments: Map[String, Any])
  case class Plan(planType: String, toolCalls: Seq[ToolCall])

  private val sectorPatterns = Seq(
    Pattern.compile("\\b(?:in|within|across)\\s+the\\s+([a-z0-9&/\\- ]+?)\\s+(?:sector|industry)\\b",
      Pattern.CASE_INSENSITIVE),
    Pattern.compile("\\b([a-z0-9&/\\- ]+?)\\s+(?:sector|industry)\\b", Pattern.CASE_INSENSITIVE))
  private val comparePattern = Pattern.compile(
    "\\bcompare\\s+(.+?)\\s+(?:and|vs\\.?|versus)\\s+(.+?)(?:\\s+(?:over|for|in)\\b|$)",
    Pattern.CASE_INSENSITIVE)

  private def normalizeSpaces(s: String): String =
    Option(s).getOrElse("").trim.replaceAll("\\s+", " ")

  def extractSector(userMessage: String): Option[String] =
    sectorPatterns.iterator.map { p =>
      val m = p.matcher(Option(userMessage).getOrElse(""))
      if (m.find()) normalizeSpaces(m.group(1)) else ""
    }.find(_.nonEmpty)

  private def windowArguments(w: Window): Map[String, Any] = w match {
    case c: CalendarPeriod => Map("period_label" -> c.periodLabel,
      "start_date" -> c.start.toString, "end_date" -> c.end.toString)
    case r: RollingPeriod => Map("period_label" -> r.periodLabel, "days" -> r.days)
  }

  /** `plan_query` (`query_planner.py:179-366`) — intents in reference
    * priority order. */
  def planQuery(userMessage: String, today: LocalDate = LocalDate.now()): Option[Plan] = {
    val text = Option(userMessage).getOrElse("").trim
    if (text.isEmpty) return None
    val lowered = text.toLowerCase(java.util.Locale.ROOT)
    val sector = extractSector(text)
    val window = resolveTimeWindow(text, today, defaultDays = 90)

    val cm = comparePattern.matcher(text)
    if (cm.find()) {
      val a = normalizeSpaces(cm.group(1))
      val b = normalizeSpaces(cm.group(2))
      if (a.nonEmpty && b.nonEmpty)
        return Some(Plan("entity_comparison", Seq(ToolCall("compare_entities", Map(
          "entity" -> "brand", "entity_a_name" -> a, "entity_b_name" -> b,
          "days" -> inferDays(text, 30), "weeks" -> 8)))))
    }

    if (lowered.contains("average crisis duration") &&
      (lowered.contains("by industry") || lowered.contains("by sector") ||
        lowered.contains("broken down by")))
      return Some(Plan("industry_duration_breakdown",
        Seq(ToolCall("aggregate_industry_durations",
          Map("entity" -> "brand", "limit" -> 25) ++ windowArguments(window)))))

    if (lowered.contains("thought leadership") || lowered.contains("story line") ||
      lowered.contains("storyline") || lowered.contains("article idea") ||
      lowered.contains("article on reputational risk") ||
      lowered.contains("interesting themes")) {
      val base = Map("entity" -> "brand", "limit" -> 3) ++ windowArguments(window)
      val args = sector.map(s => base + ("sector" -> s)).getOrElse(base)
      return Some(Plan("storyline_scan", Seq(ToolCall("find_storylines", args))))
    }

    if (sector.isDefined && (lowered.contains("what brand") ||
      lowered.contains("which brand") || lowered.contains("which brands") ||
      lowered.contains("affected")))
      return Some(Plan("sector_brand_candidates", Seq(ToolCall("screen_entities", Map(
        "entity" -> "brand", "metric" -> "top_stories_negative_count",
        "sector" -> sector.get, "days" -> inferDays(text, 7), "limit" -> 3,
        "min_value" -> 1)))))

    if (sector.isDefined && (lowered.contains("baseline") ||
      lowered.contains("normal for") || lowered.contains("worse than peers") ||
      lowered.contains("vs peers") || lowered.contains("versus peers")))
      return Some(Plan("sector_baseline", Seq(
        ToolCall("resolve_sector", Map("sector_name" -> sector.get, "limit" -> 3)),
        ToolCall("get_sector_baseline", Map(
          "entity" -> "brand", "sector" -> sector.get,
          "metric" -> "top_stories_negative_count",
          "days" -> inferDays(text, 30), "limit" -> 5)))))

    if (lowered.contains("most negative top stories") ||
      lowered.contains("negative top stories today"))
      return Some(Plan("top_stories_ranking", Seq(ToolCall("screen_entities", Map(
        "entity" -> "brand", "metric" -> "top_stories_negative_count",
        "days" -> inferDays(text, 1), "limit" -> 10, "min_value" -> 1)))))

    if (sector.isDefined && (lowered.contains("most common type of crisis") ||
      lowered.contains("most common crisis")))
      return Some(Plan("sector_crisis_pattern",
        Seq(ToolCall("aggregate_crisis_patterns",
          Map("entity" -> "brand", "sector" -> sector.get, "limit" -> 5) ++
            windowArguments(window)))))

    None
  }
}
