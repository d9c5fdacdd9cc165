package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CSV normalization helpers shared by the bronze loaders (reference
  * `src/ingest_v2.py:21-63`): bool parsing, control-class mapping, header
  * alias resolution (the reference accepts many spellings per field,
  * `ingest_v2.py:112-127,149-163`).
  */
object CsvNormalize {

  /** `parse_bool` (`ingest_v2.py:21-22`): truthy set {true,1,yes,y}. */
  def parseBool(c: Column): Column =
    lower(trim(coalesce(c.cast("string"), lit("")))).isin("true", "1", "yes", "y")

  /** `parse_optional_bool` (`ingest_v2.py:25-36`): null/"" -> null. */
  def parseOptionalBool(c: Column): Column = {
    val v = lower(trim(coalesce(c.cast("string"), lit(""))))
    when(v.isin("true", "1", "yes", "y"), lit(true))
      .when(v.isin("false", "0", "no", "n"), lit(false))
  }

  /** `parse_control_class` (`ingest_v2.py:40-46`). */
  def parseControlClass(c: Column): Column = {
    val v = lower(trim(coalesce(c.cast("string"), lit(""))))
    when(v.isin("controlled", "true", "1", "yes", "y"), lit("controlled"))
      .when(v.isin("uncontrolled", "false", "0", "no", "n"), lit("uncontrolled"))
  }

  /** Empty-string-to-null trim (the reference's `or None` idiom). */
  def trimToNull(c: Column): Column = nullif(trim(coalesce(c, lit(""))), lit(""))

  /** First-present-header alias resolution: returns the first alias that
    * exists as a column with a non-empty value per row. Aliases that aren't
    * columns in this file are skipped entirely. */
  def aliased(df: DataFrame, aliases: Seq[String]): Column = {
    val present = aliases.filter(df.columns.contains)
    if (present.isEmpty) lit(null).cast("string")
    else coalesce(present.map(a => trimToNull(col(a))): _*)
  }
}
