package graft.agent

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import java.util.regex.Pattern

/** K13: natural-language period parsing (reference
  * `insights agent/period_parser.py:11-167`) — quarter/month/year phrases ->
  * calendar windows, "last N days" -> rolling. Driver-side utility, not
  * data-plane.
  */
object PeriodParser {

  sealed trait Window {
    def periodLabel: String
    def displayLabel: String
    def days: Int
  }
  case class CalendarPeriod(periodLabel: String, displayLabel: String,
      start: LocalDate, end: LocalDate) extends Window {
    def days: Int = (end.toEpochDay - start.toEpochDay).toInt + 1
  }
  case class RollingPeriod(days: Int) extends Window {
    def periodLabel = s"rolling_${days}_days"
    def displayLabel = s"rolling $days days ending on the latest available date"
  }

  private val explicitQuarterPatterns = Seq(
    Pattern.compile("\\bq([1-4])\\s*(20\\d{2})\\b", Pattern.CASE_INSENSITIVE),
    Pattern.compile("\\b(20\\d{2})\\s*q([1-4])\\b", Pattern.CASE_INSENSITIVE),
    Pattern.compile("\\bquarter\\s*([1-4])\\s*(20\\d{2})\\b", Pattern.CASE_INSENSITIVE))
  private val rollingDayPattern =
    Pattern.compile("\\b(?:rolling|past|last)\\s+(\\d{1,3})\\s+days?\\b", Pattern.CASE_INSENSITIVE)

  private def quarterBounds(year: Int, quarter: Int): (LocalDate, LocalDate) = {
    val startMonth = (quarter - 1) * 3 + 1
    val start = LocalDate.of(year, startMonth, 1)
    val end =
      if (quarter == 4) LocalDate.of(year + 1, 1, 1).minusDays(1)
      else LocalDate.of(year, startMonth + 3, 1).minusDays(1)
    (start, end)
  }

  private def monthBounds(year: Int, month: Int): (LocalDate, LocalDate) = {
    val start = LocalDate.of(year, month, 1)
    val end =
      if (month == 12) LocalDate.of(year + 1, 1, 1).minusDays(1)
      else LocalDate.of(year, month + 1, 1).minusDays(1)
    (start, end)
  }

  private val monthYearFmt = DateTimeFormatter.ofPattern("MMMM yyyy")

  /** `resolve_time_window` (`period_parser.py:60-167`). */
  def resolveTimeWindow(userMessage: String, today: LocalDate = LocalDate.now(),
      defaultDays: Int = 90): Window = {
    val text = Option(userMessage).getOrElse("").trim.toLowerCase(java.util.Locale.ROOT)

    for (p <- explicitQuarterPatterns) {
      val m = p.matcher(text)
      if (m.find()) {
        val first = m.group(1).toInt
        val second = m.group(2).toInt
        val (year, quarter) = if (first > 4) (first, second) else (second, first)
        val (start, end) = quarterBounds(year, quarter)
        return CalendarPeriod(s"q${quarter}_$year", s"Q$quarter $year", start, end)
      }
    }

    if (text.contains("last quarter") || text.contains("previous quarter")) {
      val currentQuarter = (today.getMonthValue - 1) / 3 + 1
      val (year, quarter) =
        if (currentQuarter == 1) (today.getYear - 1, 4) else (today.getYear, currentQuarter - 1)
      val (start, end) = quarterBounds(year, quarter)
      return CalendarPeriod("last_quarter", s"last quarter (Q$quarter $year)", start, end)
    }
    if (text.contains("this quarter") || text.contains("current quarter") ||
      text.contains("quarter to date")) {
      val quarter = (today.getMonthValue - 1) / 3 + 1
      val (start, _) = quarterBounds(today.getYear, quarter)
      return CalendarPeriod("this_quarter",
        s"this quarter to date (Q$quarter ${today.getYear})", start, today)
    }
    if (text.contains("last month")) {
      val (year, month) =
        if (today.getMonthValue == 1) (today.getYear - 1, 12)
        else (today.getYear, today.getMonthValue - 1)
      val (start, end) = monthBounds(year, month)
      return CalendarPeriod("last_month", s"last month (${start.format(monthYearFmt)})",
        start, end)
    }
    if (text.contains("this month") || text.contains("month to date")) {
      val (start, _) = monthBounds(today.getYear, today.getMonthValue)
      return CalendarPeriod("this_month",
        s"this month to date (${start.format(monthYearFmt)})", start, today)
    }
    if (text.contains("last year") || text.contains("previous year")) {
      return CalendarPeriod("last_year", s"last year (${today.getYear - 1})",
        LocalDate.of(today.getYear - 1, 1, 1), LocalDate.of(today.getYear - 1, 12, 31))
    }
    if (text.contains("this year") || text.contains("year to date")) {
      return CalendarPeriod("this_year", s"this year to date (${today.getYear})",
        LocalDate.of(today.getYear, 1, 1), today)
    }

    val m = rollingDayPattern.matcher(text)
    if (m.find()) return RollingPeriod(math.min(math.max(m.group(1).toInt, 1), 365))

    if (text.contains("today")) return RollingPeriod(1)
    if (text.contains("this week") || text.contains("past week") ||
      text.contains("last 7 days")) return RollingPeriod(7)
    if (text.contains("past month") || text.contains("last 30 days"))
      return RollingPeriod(30)
    if (text.contains("past quarter") || text.contains("last 90 days"))
      return RollingPeriod(90)
    if (text.contains("last 365 days")) return RollingPeriod(365)

    RollingPeriod(defaultDays)
  }

  /** `infer_days` (`query_planner.py:47-59`). */
  def inferDays(userMessage: String, defaultDays: Int = 30): Int = {
    val text = Option(userMessage).getOrElse("").toLowerCase(java.util.Locale.ROOT)
    if (text.contains("today")) 1
    else if (text.contains("this week") || text.contains("last 7 days") ||
      text.contains("past week")) 7
    else if (text.contains("this month") || text.contains("last 30 days") ||
      text.contains("past month")) 30
    else if (text.contains("this quarter") || text.contains("last quarter") ||
      text.contains("last 90 days")) 90
    else if (text.contains("this year") || text.contains("last year") ||
      text.contains("last 365 days")) 365
    else defaultDays
  }
}
