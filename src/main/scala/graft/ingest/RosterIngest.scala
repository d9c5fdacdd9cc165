package graft.ingest

import graft.ingest.CsvNormalize._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S1 roster loader (reference `src/ingest_v2.py:106-181`): parse
  * `main-roster.csv` (header-alias tolerant), produce the `companies` and
  * `ceos` dimension snapshots. The reference's dict-overwrite semantics
  * (LAST row per company name wins) are reproduced with a dedup window over
  * the file order.
  *
  * Dims are roster-scale — a full-snapshot overwrite per delivery is the
  * Spark-idiomatic replacement for per-row `on conflict do update`.
  */
object RosterIngest {

  def readRosterCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("mode", "PERMISSIVE").csv(path)
      // CSV file order: monotonically_increasing_id is file-position-stable HERE because it
      // sits directly above the file scan (partition ids follow file-split offsets);
      // it must never be computed above a union/join/shuffle — see CrisisEvents for
      // the explicit-ordering alternative when no file order exists
      .withColumn("__file_order", monotonically_increasing_id())

  /** companies dim from a roster df (last row per name wins). */
  def companies(roster: DataFrame): DataFrame = {
    val parsed = roster.select(
      aliased(roster, Seq("Company", "company")).as("name"),
      coalesce(aliased(roster, Seq("Stock", "stock")), lit("")).as("ticker"),
      coalesce(aliased(roster, Seq("Sector", "sector")), lit("")).as("sector"),
      coalesce(aliased(roster, Seq("Websites", "websites", "Website", "website")), lit(""))
        .as("websites"),
      parseBool(aliased(roster, Seq("Favorite", "favorite", "Favorites", "favorites",
        "Company Favorite", "company_favorite", "Favorite Company", "favorite_company")))
        .as("favorite"),
      col("__file_order"))
      .filter(col("name").isNotNull)
    val w = Window.partitionBy("name").orderBy(col("__file_order").desc)
    parsed.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .withColumn("id", sha2(col("name"), 256)) // deterministic surrogate id
      .select("id", "name", "ticker", "sector", "websites", "favorite")
  }

  /** S2 boards roster (`src/ingest_metrics.py:215-255`): resolve (ceo,
    * company) names -> ids, derive the domain, dedup on (ceo_id, url) with
    * last-row-wins (the ON CONFLICT DO UPDATE analogue). */
  def boards(boardsCsv: DataFrame, companiesDim: DataFrame, ceosDim: DataFrame): DataFrame = {
    val parsed = boardsCsv
      .withColumn("__file_order", monotonically_increasing_id())
      .select(
        aliased(boardsCsv, Seq("CEO", "ceo")).as("ceo_name"),
        coalesce(aliased(boardsCsv, Seq("Company", "company")), lit("")).as("company_name"),
        aliased(boardsCsv, Seq("URL", "url")).as("url"),
        coalesce(aliased(boardsCsv, Seq("Source", "source")), lit("")).as("source"),
        to_timestamp(aliased(boardsCsv, Seq("last_updated", "Last Updated")))
          .as("last_updated"),
        col("__file_order"))
      .filter(col("ceo_name").isNotNull && col("url").isNotNull)
      .withColumn("domain", graft.functions.UrlFunctions.hostName(col("url")))
      .join(broadcast(companiesDim.select(col("id").as("company_id"),
        col("name").as("company_name"))), Seq("company_name"))
      .join(broadcast(ceosDim.select(col("id").as("ceo_id"),
        col("name").as("ceo_name"), col("company_id").as("ceo_company_id"))),
        Seq("ceo_name"))
      .filter(col("company_id") === col("ceo_company_id"))
    val w = Window.partitionBy("ceo_id", "url").orderBy(col("__file_order").desc)
    parsed.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select("ceo_id", "company_id", "url", "domain", "source", "last_updated")
  }

  /** ceos dim: name-resolution join against companies (J6), last row per
    * (ceo, company) wins. */
  def ceos(roster: DataFrame, companiesDim: DataFrame): DataFrame = {
    val parsed = roster.select(
      aliased(roster, Seq("CEO", "ceo")).as("ceo_name"),
      aliased(roster, Seq("Company", "company")).as("company_name"),
      coalesce(aliased(roster, Seq("CEO Alias", "ceo alias", "alias")), lit("")).as("alias"),
      parseBool(aliased(roster, Seq("CEO Favorite", "ceo_favorite", "CEO Favorites",
        "ceo_favorites", "Favorites", "favorites", "Favorite CEO", "favorite_ceo",
        "Favorite (CEO)"))).as("favorite"),
      col("__file_order"))
      .filter(col("ceo_name").isNotNull && col("company_name").isNotNull)
    val w = Window.partitionBy("ceo_name", "company_name").orderBy(col("__file_order").desc)
    parsed.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .join(broadcast(companiesDim.select(col("id").as("company_id"),
        col("name").as("company_name"))), Seq("company_name"))
      .withColumn("id", sha2(concat(col("ceo_name"), lit("|"), col("company_id")), 256))
      .select(col("id"), col("ceo_name").as("name"), col("company_id"), col("alias"),
        col("favorite"))
  }
}
