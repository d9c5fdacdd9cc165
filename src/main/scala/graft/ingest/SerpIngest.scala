package graft.ingest

import graft.functions.UrlFunctions
import graft.ingest.CsvNormalize._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4 SERP "modal" CSV loader (reference `src/ingest_v2.py:453-618`): one
  * `serp_runs` row per entity per file date plus `serp_results` child rows
  * keyed (run, rank, url_hash). Run ids are deterministic hashes of
  * (entity_type, entity_id, run_at) — the reference's surrogate uuid with a
  * reproducible stand-in, so re-ingest is idempotent.
  */
object SerpIngest {

  def readModalCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** Normalize one serp modal CSV (brand or ceo flavor): resolve entities,
    * canonical urls + hashes, label parsing. */
  def normalize(raw: DataFrame, entityType: String, companiesDim: DataFrame,
      ceosDim: DataFrame, runAt: Column): DataFrame = {
    val base = raw
      // CSV file order: monotonically_increasing_id is file-position-stable HERE because it
      // sits directly above the file scan (partition ids follow file-split offsets);
      // it must never be computed above a union/join/shuffle — see CrisisEvents for
      // the explicit-ordering alternative when no file order exists
      .withColumn("__order", monotonically_increasing_id())
      .withColumn("title", trimToNull(aliased(raw, Seq("title"))))
      .withColumn("url_raw", trimToNull(aliased(raw, Seq("url", "link"))))
      .filter(col("title").isNotNull && col("url_raw").isNotNull)
      .withColumn("url", UrlFunctions.normalizeUrl(col("url_raw")))
      .filter(col("url") =!= "")
      .withColumn("url_hash", UrlFunctions.urlHash(col("url_raw")))
      .withColumn("domain", UrlFunctions.hostName(col("url_raw")))
      .withColumn("snippet", coalesce(aliased(raw, Seq("snippet")), lit("")))
      .withColumn("source", coalesce(aliased(raw, Seq("source")), lit("")))
      .withColumn("position", aliased(raw, Seq("position")).cast("int"))
      .withColumn("sentiment_label", lower(aliased(raw, Seq("sentiment"))))
      .withColumn("control_class",
        parseControlClass(aliased(raw, Seq("controlled", "control_class"))))
      .withColumn("finance_routine", parseOptionalBool(aliased(raw, Seq("finance_routine"))))
      .withColumn("llm_label", aliased(raw, Seq("llm_label")))
      .withColumn("llm_severity", aliased(raw, Seq("llm_severity")))
      .withColumn("published_date",
        to_date(aliased(raw, Seq("published_date", "published", "pub_date"))))
      .withColumn("company_name", coalesce(aliased(raw, Seq("company")), lit("")))
      .withColumn("ceo_name",
        if (raw.columns.contains("ceo")) coalesce(aliased(raw, Seq("ceo")), lit(""))
        else lit(""))
      .withColumn("run_at", runAt)

    val withCompany = base.join(
      broadcast(companiesDim.select(col("id").as("company_id"),
        col("name").as("company_name"))),
      Seq("company_name"), "left")
    val resolved =
      if (entityType == "ceo")
        withCompany.join(
          broadcast(ceosDim.select(col("id").as("ceo_id"), col("name").as("ceo_name"),
            col("company_id").as("ceo_company_id"))),
          Seq("ceo_name"), "left")
          .filter(col("ceo_id").isNotNull && col("company_id") === col("ceo_company_id"))
          .withColumn("entity_id", col("ceo_id"))
      else
        withCompany.filter(col("company_id").isNotNull)
          .withColumn("ceo_id", lit(null: String))
          .withColumn("entity_id", col("company_id"))
    resolved
      .withColumn("entity_type", lit(if (entityType == "ceo") "ceo" else "company"))
      .withColumn("serp_run_id",
        sha2(concat_ws("|", col("entity_type"), col("entity_id"),
          col("run_at").cast("string")), 256))
  }

  /** `serp_runs`: one row per entity per run_at (`ingest_v2.py:524-560`). */
  def serpRuns(normalized: DataFrame): DataFrame =
    normalized
      .groupBy(col("serp_run_id").as("id"), col("entity_type"),
        col("company_id"), col("ceo_id"), col("run_at"))
      .agg(max(col("company_name")).as("query_text"))
      .withColumn("provider", lit("serpapi"))

  /** `serp_results`: child rows, dedup on (run, rank, url_hash) with
    * first-row-wins (the unique index's ON CONFLICT DO NOTHING analogue). */
  def serpResults(normalized: DataFrame): DataFrame =
    graft.operators.Effective.latestWins(
      normalized, Seq("serp_run_id", "position", "url_hash"),
      Seq(col("__order").asc))
      .select(
        sha2(concat_ws("|", col("serp_run_id"), col("position"), col("url_hash")), 256)
          .as("id"),
        col("serp_run_id"), col("position").as("rank"), col("url"), col("url_hash"),
        col("title"), col("snippet"), col("domain"), col("published_date"),
        col("sentiment_label"), col("control_class"), col("finance_routine"),
        col("llm_label").as("llm_sentiment_label"), col("llm_severity"))
}
