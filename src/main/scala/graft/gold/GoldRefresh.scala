package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Full gold-layer rebuild — the engine's answer to the reference's
  * `POST /api/internal/refresh_aggregates` (`dashboard_app/app.py:5849-5896`),
  * which refreshes six materialized views synchronously inside one advisory-
  * lock section (negative_summary_mv refreshes on the ingest path). Spark
  * needs no lock: each gold table is rebuilt as a DataFrame and written with
  * dynamic partition overwrite, so readers keep a consistent snapshot and
  * only affected date partitions are replaced.
  *
  * Rebuild order follows the reference's refresh sequence. The four
  * serp-feature MVs all derive from the same effective-items projection
  * (override coalesce chains applied at item grain); it is computed ONCE and
  * persisted for the batch — Spark shares no subplans across builders, and
  * at 100 TB recomputing the override-join four times is the difference
  * between one shuffle and four.
  */
object GoldRefresh {

  /** Bronze/silver inputs for a full rebuild (reference-schema tables). */
  final case class BronzeInputs(
      companies: DataFrame,
      ceos: DataFrame,
      articles: DataFrame,
      companyMentions: DataFrame,
      ceoMentions: DataFrame,
      companyMentionsDaily: DataFrame,
      ceoMentionsDaily: DataFrame,
      companyArticleOverrides: DataFrame,
      ceoArticleOverrides: DataFrame,
      serpRuns: DataFrame,
      serpResults: DataFrame,
      serpResultOverrides: DataFrame,
      serpFeatureItems: DataFrame,
      serpFeatureItemOverrides: DataFrame,
      serpFeatureUrlOverrides: DataFrame)

  /** All 7 gold tables in the reference's refresh order. The returned pairs
    * are (table name, DataFrame); callers write them with
    * `partitionBy("date")` + dynamic partition overwrite. */
  def rebuildAll(in: BronzeInputs): Seq[(String, DataFrame)] =
    rebuildAllWithHandle(in)._1

  /** rebuildAll plus the persisted shared intermediate, so callers that
    * materialize everything (refreshToParquet) can unpersist it after. */
  def rebuildAllWithHandle(in: BronzeInputs): (Seq[(String, DataFrame)], DataFrame) = {
    val eff = GoldTables.featureItemsEffective(
      in.serpFeatureItems, in.serpFeatureItemOverrides, in.serpFeatureUrlOverrides)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tables = Seq(
      "serp_feature_daily" ->
        GoldTables.serpFeatureDailyFromEffective(eff),
      "serp_feature_control_daily" ->
        GoldTables.serpFeatureControlDailyFromEffective(eff),
      "serp_feature_daily_index" ->
        GoldTables.serpFeatureDailyIndexFromEffective(eff),
      "serp_feature_control_daily_index" ->
        GoldTables.serpFeatureControlDailyIndexFromEffective(eff),
      "article_daily_counts" ->
        GoldTables.articleDailyCounts(in.companyMentionsDaily, in.ceoMentionsDaily,
          in.companies, in.ceos, in.companyArticleOverrides, in.ceoArticleOverrides),
      "serp_daily_counts" ->
        GoldTables.serpDailyCounts(in.serpRuns, in.serpResults,
          in.serpResultOverrides, in.companies, in.ceos),
      "negative_summary" ->
        GoldTables.negativeSummary(in.companyMentionsDaily, in.ceoMentionsDaily,
          in.companyMentions, in.ceoMentions, in.companies, in.ceos, in.articles,
          in.companyArticleOverrides, in.ceoArticleOverrides))
    (tables, eff)
  }

  /** Rebuild and write every gold table under `base/<name>` partitioned by
    * date with dynamic partition overwrite (the incremental analogue of the
    * reference's whole-MV refresh). Returns per-table wall times. */
  def refreshToParquet(in: BronzeInputs, base: String): Seq[(String, Double)] = {
    val (tables, eff) = rebuildAllWithHandle(in)
    val spark = tables.head._2.sparkSession
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      tables.map { case (name, df) =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").partitionBy("date").parquet(s"$base/$name")
        name -> (System.nanoTime() - t0) / 1e9
      }
    finally {
      eff.unpersist() // the shared intermediate must not outlive the refresh
      prevMode match {
        case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
