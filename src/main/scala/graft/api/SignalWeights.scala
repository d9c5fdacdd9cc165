package graft.api

/** A14 composite-signal weight handling (reference
  * `dashboard_app/app.py:175-184,765-804`): default weights plus the legacy
  * `serpNegativeFeatures` rescaling — when a preset still carries the old
  * combined feature weight, the five per-feature defaults are scaled so
  * their sum matches it; explicit per-feature values always win.
  */
object SignalWeights {

  val Defaults: Map[String, Double] = Map(
    "newsNegative" -> 0.24,
    "organicNegative" -> 0.24,
    "topStoriesNegative" -> 0.16,
    "aioCitationsNegative" -> 0.12,
    "paaNegative" -> 0.1,
    "videosNegative" -> 0.07,
    "perspectivesNegative" -> 0.07,
    "serpControl" -> 0.1)

  private val FeatureKeys = Seq("topStoriesNegative", "aioCitationsNegative",
    "paaNegative", "videosNegative", "perspectivesNegative")

  /** `_coerce_weight` (`app.py:751-762`): unparseable/non-finite ->
    * fallback; then clamp to [0, 1]. */
  private def coerce(v: Option[Any], fallback: Double): Double = {
    val numeric = v match {
      case Some(d: Double) => d
      case Some(i: Int) => i.toDouble
      case Some(l: Long) => l.toDouble
      case Some(s: String) => s.toDoubleOption.getOrElse(fallback)
      case _ => fallback
    }
    val finite = if (java.lang.Double.isFinite(numeric)) numeric else fallback
    if (finite < 0) 0.0 else if (finite > 1) 1.0 else finite
  }

  /** `normalize_signal_weight_payload` (`app.py:765-804`). */
  def normalize(payload: Map[String, Any]): Map[String, Double] = {
    val featureDefaultSum = FeatureKeys.map(Defaults).sum match {
      case 0.0 => 1.0
      case s => s
    }
    val legacyFeatureWeight = coerce(payload.get("serpNegativeFeatures"), featureDefaultSum)
    val featureScale = legacyFeatureWeight / featureDefaultSum
    Map(
      "newsNegative" -> coerce(payload.get("newsNegative"), Defaults("newsNegative")),
      "organicNegative" -> coerce(
        payload.get("organicNegative").orElse(payload.get("serpNegativeOrganic")),
        Defaults("organicNegative")),
      "serpControl" -> coerce(payload.get("serpControl"), Defaults("serpControl"))
    ) ++ FeatureKeys.map { k =>
      k -> coerce(payload.get(k), Defaults(k) * featureScale)
    }
  }

  /** The weighted linear score (entity-store.js:131-215 shape):
    * sum of metric*weight minus the control term. */
  def score(metrics: Map[String, Long], weights: Map[String, Double]): Double = {
    val negatives = (weights - "serpControl").toSeq.sortBy(_._1).map {
      case (k, w) => metrics.getOrElse(k, 0L) * w
    }.sum
    negatives - metrics.getOrElse("serpControl", 0L) * weights.getOrElse("serpControl", 0.0)
  }

  // ------------------------------------------------------- preset store
  // `GET/POST/DELETE /api/internal/signal_presets` (`app.py:6270-6382`)
  // over a `signal_weight_presets` table: (id, tab_id, preset_name,
  // weights, created_by, updated_by, created_at, updated_at).

  /** `normalize_signal_preset_tab_id` (`app.py:739-742`). */
  def normalizeTabId(value: String): String = {
    val t = Option(value).getOrElse("").trim.toLowerCase(java.util.Locale.ROOT)
    if (t == "brands" || t == "ceos") t else ""
  }

  /** `normalize_signal_preset_name` (`app.py:744-748`): whitespace collapse
    * then an 80-char cap. */
  def normalizePresetName(value: String): String = {
    val name = Option(value).getOrElse("").trim.split("\\s+").mkString(" ")
    if (name.length > 80) name.take(80).trim else name
  }

  /** Stable JSON for a weights map (sorted keys — the storage format).
    * Keys are JSON-string-escaped so a quote/backslash/control char in a
    * metric key cannot corrupt the stored preset. */
  def weightsJson(weights: Map[String, Double]): String =
    weights.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${escapeJsonString(k)}":$v""" }
      .mkString("{", ",", "}")

  private def escapeJsonString(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** GET: list presets, optional tab filter, ordered
    * (tab_id, lower(name), name). */
  def listPresets(
      presets: org.apache.spark.sql.DataFrame,
      tabId: Option[String] = None): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val filtered = tabId.map(normalizeTabId).filter(_.nonEmpty) match {
      case Some(t) => presets.filter(col("tab_id") === t)
      case None => presets
    }
    filtered.orderBy(col("tab_id"), lower(col("preset_name")), col("preset_name"))
  }

  /** POST upsert: `on conflict (tab_id, preset_name) do update set
    * weights_json/updated_by/updated_at` — id/created_by/created_at are
    * NOT listed, so [[graft.sinks.MergeWriter]]'s default (existing wins on
    * update, batch on insert) preserves them exactly like the reference's
    * ON CONFLICT clause. Returns the merged table. */
  def upsertPreset(
      presets: org.apache.spark.sql.DataFrame,
      batch: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.sinks.MergeWriter.merge(presets, batch,
      graft.sinks.MergeWriter.MergeSpec(
        keys = Seq("tab_id", "preset_name"),
        overwrite = Seq("weights", "updated_by", "updated_at")))

  /** DELETE by (tab_id, preset_name). */
  def deletePreset(
      presets: org.apache.spark.sql.DataFrame,
      tabId: String, presetName: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    presets.filter(!(col("tab_id") === normalizeTabId(tabId) &&
      col("preset_name") === normalizePresetName(presetName)))
  }
}
