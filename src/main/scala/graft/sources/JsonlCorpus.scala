package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, StringType}

/** JSONL corpus source — the interchange format of large text/training
  * datasets (one JSON document per line). Schema-enforced parse with a
  * corrupt-line quarantine, so a 100 TB ingest never dies on one bad line
  * and never silently drops it either.
  *
  * Built as `spark.read.text` + `from_json` rather than `spark.read.json`:
  *  - the text scan is line-splittable and schema-free — no sampling
  *    inference pass over the corpus (inference reads everything once
  *    BEFORE the real read at scale);
  *  - Spark's native JSON reader cannot filter on its corrupt-record
  *    column without caching the whole relation (the documented
  *    restriction) — parsing per line with `from_json` sidesteps that, so
  *    good rows and quarantine rows are both plain lazy projections of ONE
  *    scan;
  *  - blank lines are skipped (JSONL convention), not quarantined.
  *
  * `parse` returns the raw line + parsed struct + `corrupt` flag; callers
  * split with [[documents]] / [[quarantine]] (two filters over the same
  * plan — Spark scans once per action, and both sides pushd down to the
  * same text source).
  */
object JsonlCorpus {

  /** One row per non-blank input line: (`line`, `doc` struct, `corrupt`).
    * A line is corrupt when it fails to parse as a JSON object matching
    * `schema` (type mismatches surface as the PERMISSIVE null-field
    * convention, same as Spark's JSON reader; only malformed JSON
    * quarantines). */
  def parse(spark: SparkSession, path: String, schema: StructType): DataFrame =
    project(spark.read.text(path), schema)

  /** Streaming twin: the same parse/quarantine projection over a
    * `readStream.text` source — new JSONL drops parse incrementally, and
    * [[documents]]/[[quarantine]] split the stream exactly as in batch
    * (both are stateless projections, so any output mode works). */
  def parseStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    project(spark.readStream.text(path), schema)

  /** The shared projection: batch and streaming differ ONLY in the text
    * source, so parse semantics cannot drift between the two paths. */
  private[sources] def project(lines: DataFrame, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains("_raw"), "field name _raw is reserved")
    // the corrupt-record column rides inside the parse schema: non-null
    // exactly when the line was malformed
    val withCorrupt = StructType(schema.fields :+ StructField("_raw", StringType))
    lines
      .filter(length(trim(col("value"))) > 0)
      .select(
        col("value").as("line"),
        from_json(col("value"), withCorrupt,
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_raw"))
          .as("doc"))
      .withColumn("corrupt", col("doc").isNull || col("doc._raw").isNotNull)
  }

  /** The good side: parsed documents with `schema`'s columns. */
  def documents(parsed: DataFrame): DataFrame =
    parsed.filter(!col("corrupt")).select(col("doc.*")).drop("_raw")

  /** The quarantine side: raw malformed lines, for repair/audit. */
  def quarantine(parsed: DataFrame): DataFrame =
    parsed.filter(col("corrupt")).select(col("line"))
}
