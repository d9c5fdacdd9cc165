package graft.api

/** The reference's endpoint guardrails — result-size caps and lookback caps
  * (BASELINE.md anchors; each cite is the clamp site in
  * `dashboard_app/app.py`). Clamp semantics mirror the reference exactly:
  * `limit = min(max(limit, 1), cap)`, `offset = max(offset, 0)`,
  * `days = min(max(days, 1), cap)`, with endpoint-specific caps/defaults.
  *
  * At engine scale these are the knobs that keep endpoint-equivalent reads
  * bounded regardless of table size: every reader takes a clamped limit and
  * a clamped lookback, so a misbehaving caller can never force an unbounded
  * scan-and-collect.
  */
object ApiLimits {

  /** articles/serps modal exports: limit<=1000 (`app.py:2865-2873`). */
  val ArticlesMaxLimit = 1000
  /** serp feature item lists: limit<=500 (`app.py:3369-3376`). */
  val FeatureItemsMaxLimit = 500
  /** anomalies + evidence lists: limit<=200 (`app.py:3108-3110,5285`). */
  val AnomaliesMaxLimit = 200
  /** insights screen: limit<=100 (`app.py:4361`). */
  val ScreenMaxLimit = 100

  /** timeline/series lookback: <=365 days (`app.py:3662-3663`). */
  val SeriesMaxDays = 365
  /** trend/anomalies/baseline lookback: <=180 days (`app.py:3105-3108,5151`). */
  val TrendMaxDays = 180
  /** evidence/screen/feature lookback: <=90 days (`app.py:4360,5284`). */
  val ScreenMaxDays = 90

  /** `limit = min(max(limit, 1), cap)` */
  def clampLimit(limit: Int, cap: Int): Int = math.min(math.max(limit, 1), cap)

  /** `offset = max(offset, 0)` */
  def clampOffset(offset: Int): Int = math.max(offset, 0)

  /** `days = min(max(days, 1), cap)` */
  def clampDays(days: Int, cap: Int): Int = math.min(math.max(days, 1), cap)
}
