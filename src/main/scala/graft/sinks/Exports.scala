package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** S10/S11: CSV + JSON export sinks matching the reference's download
  * surface (`dashboard_app/app.py:6676-6740` roster.csv,
  * `app.py:6692-6733` stock/trends CSVs with `|`-joined series columns,
  * plus the JSON-lines shape of every `jsonify(serialize_rows(...))`
  * endpoint).
  *
  * Spark-first posture: exports are plain `df.write` — the frames below
  * only RENAME/reshape to the reference's exact header contract, so the
  * writers stay distributed (partitioned CSV/JSON at scale). The
  * single-file variants exist for the dashboard-download use case where
  * the result is endpoint-sized (caller asserts that by choosing them).
  */
object Exports {

  /** `roster.csv` header contract (`app.py:6687`). Input:
    * [[graft.api.MarketData.roster]] output. */
  def rosterCsvFrame(roster: DataFrame): DataFrame =
    roster.select(
      col("ceo").as("CEO"), col("company").as("Company"),
      col("ceo_alias").as("CEO Alias"), col("websites").as("Websites"),
      col("stock").as("Stock"), col("sector").as("Sector"),
      col("company_favorite").as("Company Favorite"),
      col("ceo_favorite").as("CEO Favorite"))

  /** `stock_data_YYYY-MM-DD.csv` shape (`app.py:6692-6733`): history arrays
    * flattened to `|`-joined strings. Input: MarketData.stockData output. */
  def stockCsvFrame(stockRows: DataFrame): DataFrame =
    stockRows.select(
      col("ticker"), col("company"), col("opening_price"),
      col("daily_change_pct"), col("seven_day_change_pct"),
      array_join(transform(col("price_history"), p => p.cast("string")), "|")
        .as("price_history"),
      array_join(col("date_history"), "|").as("date_history"),
      col("last_updated"))

  /** Distributed CSV write (header on, reference's empty-string nulls). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("emptyValue", "").csv(path)

  /** Endpoint-sized single-file CSV (dashboard download): ONE output file
    * via coalesce(1) — only for results already bounded by the endpoint's
    * caps; never on a table-sized frame. */
  def writeSingleCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").option("emptyValue", "").csv(path)

  /** JSON-lines write — the engine-side form of `serialize_rows` responses
    * (one object per row, ISO dates — Spark's JSON writer default). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)
}
