package graft.ingest

import graft.functions.{RiskRules, UrlFunctions}
import graft.ingest.CsvNormalize._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S3 articles "modal" CSV loader (reference `src/ingest_v2.py:253-450`):
  * per-date CSV of scored articles ->
  *   - `articles` rows deduped by canonical URL with first/last-seen min/max
  *     + coalesce-preserving field merge (`ingest_v2.py:195-222`),
  *   - per-entity `*_article_mentions` rows,
  *   - date-grain `*_article_mentions_daily` rows.
  * Derivations on the way in: URL canonicalization (dedup key),
  * finance-routine fallback classify, finance sentiment neutralization,
  * control-class fallback classify (K11/K12 kernels).
  */
object ArticlesIngest {

  private val financeUdf = udf((t: String, s: String, u: String, p: String) =>
    RiskRules.isFinancialRoutine(Option(t).getOrElse(""), Option(s).getOrElse(""),
      Option(u).getOrElse(""), Option(p).getOrElse("")))
  private val neutralizeUdf = udf(
    (sent: String, t: String, s: String, u: String, p: String, fr: java.lang.Boolean) =>
      RiskRules.shouldNeutralizeFinanceRoutine(sent, Option(t).getOrElse(""),
        Option(s).getOrElse(""), Option(u).getOrElse(""), Option(p).getOrElse(""), fr))
  private val controlUdf = udf((company: String, url: String, websites: String,
      entityType: String, person: String, publisher: String) =>
    RiskRules.classifyControl(Option(company).getOrElse(""), Option(url).getOrElse(""),
      RiskRules.parseCompanyDomains(Option(websites).getOrElse("")),
      entityType = Option(entityType).getOrElse("company"),
      personName = person, publisher = publisher))

  def readModalCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** Normalize + derive one modal CSV (brand or ceo flavor). Output grain =
    * input rows, with canonical url, effective sentiment/control columns. */
  def normalize(raw: DataFrame, entityType: String, companiesDim: DataFrame): DataFrame = {
    val withUrl = raw
      // CSV file order: monotonically_increasing_id is file-position-stable HERE because it
      // sits directly above the file scan (partition ids follow file-split offsets);
      // it must never be computed above a union/join/shuffle — see CrisisEvents for
      // the explicit-ordering alternative when no file order exists
      .withColumn("__order", monotonically_increasing_id())
      .withColumn("title", trimToNull(aliased(raw, Seq("title"))))
      .withColumn("url_raw", trimToNull(aliased(raw, Seq("url"))))
      .filter(col("title").isNotNull && col("url_raw").isNotNull)
      .withColumn("canonical_url", UrlFunctions.normalizeUrl(col("url_raw")))
      .filter(col("canonical_url") =!= "")
      .withColumn("publisher", coalesce(aliased(raw, Seq("source")), lit("")))
      .withColumn("snippet", coalesce(aliased(raw, Seq("snippet")), lit("")))
      // reference: (row.get('sentiment') or '').strip().lower() or None
      // (`ingest_v2.py:277`) — trim first, empty → null, then lowercase
      .withColumn("sentiment_in", lower(trimToNull(aliased(raw, Seq("sentiment")))))
      .withColumn("control_in",
        parseControlClass(aliased(raw, Seq("controlled", "control_class"))))
      .withColumn("finance_in", parseOptionalBool(aliased(raw, Seq("finance_routine"))))
      .withColumn("uncertain", parseBool(aliased(raw, Seq("uncertain"))))
      .withColumn("llm_label", aliased(raw, Seq("llm_label")))
      .withColumn("llm_severity", aliased(raw, Seq("llm_severity")))
      .withColumn("published_at_raw", aliased(raw,
        Seq("published_at", "published", "pub_date", "pubDate", "published_date")))
      .withColumn("published_at", to_timestamp(col("published_at_raw")))
      .withColumn("company_name", coalesce(aliased(raw, Seq("company")), lit("")))
      .withColumn("ceo_name",
        if (raw.columns.contains("ceo")) coalesce(aliased(raw, Seq("ceo")), lit(""))
        else lit(""))

    val dims = broadcast(companiesDim.select(col("id").as("company_id"),
      col("name").as("company_name"), col("websites")))
    val withDims = withUrl.join(dims, Seq("company_name"), "left")

    withDims
      .withColumn("finance_routine",
        coalesce(col("finance_in"),
          financeUdf(col("title"), col("snippet"), col("canonical_url"), col("publisher"))))
      .withColumn("sentiment",
        when(neutralizeUdf(col("sentiment_in"), col("title"), col("snippet"),
          col("canonical_url"), col("publisher"), col("finance_routine")), lit("neutral"))
          .otherwise(col("sentiment_in")))
      .withColumn("control_class",
        coalesce(col("control_in"),
          when(controlUdf(col("company_name"), col("canonical_url"), col("websites"),
            lit(entityType), col("ceo_name"), col("publisher")), "controlled")
            .otherwise("uncontrolled")))
  }

  /** `articles` upsert batch from normalized rows: dedupe by canonical_url
    * (`ingest_v2.py:297-300`: later rows keep the first non-null
    * published_at; first/last-seen collapse to the batch's seen_at). */
  def articlesBatch(normalized: DataFrame, seenAt: Column): DataFrame =
    normalized
      .groupBy(col("canonical_url"))
      .agg(
        // dict-overwrite semantics: LAST row's title/publisher win; the
        // FIRST row's non-null published_at is kept (ingest_v2.py:297-300).
        // file order travels in __order; struct min/max makes the pick
        // order-stable under parallel aggregation.
        max(struct(col("__order"), col("title"))).getField("title").as("title"),
        max(struct(col("__order"), col("publisher"))).getField("publisher").as("publisher"),
        min(when(col("published_at").isNotNull,
          struct(col("__order"), col("published_at")))).getField("published_at")
          .as("published_at"))
      .withColumn("snippet", lit(null: String))
      .withColumn("first_seen_at", seenAt)
      .withColumn("last_seen_at", seenAt)
      .withColumn("source", lit("google_rss"))
      .withColumn("id", sha2(col("canonical_url"), 256))

  /** Merge a new articles batch into the existing articles table with the
    * reference's conflict semantics (S12, `ingest_v2.py:195-222`): coalesce-
    * preserving field updates, min(first_seen), max(last_seen). Delegates to
    * the generalized pure-parquet MERGE ([[graft.sinks.MergeWriter]]). */
  def mergeArticles(existing: DataFrame, batch: DataFrame): DataFrame =
    graft.sinks.MergeWriter.merge(existing, batch,
      graft.sinks.MergeWriter.MergeSpec(
        keys = Seq("canonical_url", "id"),
        coalescePreserving = Seq("title", "publisher", "snippet", "published_at", "source"),
        minOf = Seq("first_seen_at"),
        maxOf = Seq("last_seen_at")))

  /** Mention rows (brand flavor): resolve company, drop unresolvable
    * (`ingest_v2.py:304-308`). */
  def companyMentions(normalized: DataFrame, scoredAt: Column): DataFrame =
    normalized.filter(col("company_id").isNotNull)
      .select(col("company_id"), sha2(col("canonical_url"), 256).as("article_id"),
        col("sentiment").as("sentiment_label"), col("control_class"),
        col("finance_routine"), col("uncertain"),
        col("llm_label"), col("llm_severity"), scoredAt.as("scored_at"))

  def companyMentionsDaily(normalized: DataFrame, date: Column): DataFrame =
    normalized.filter(col("company_id").isNotNull)
      .select(date.as("date"), col("company_id"),
        sha2(col("canonical_url"), 256).as("article_id"),
        col("sentiment").as("sentiment_label"), col("control_class"),
        col("finance_routine"), col("uncertain"))
      .dropDuplicates("date", "company_id", "article_id")
}
