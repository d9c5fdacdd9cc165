package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * All facts are read straight from parquet; Catalyst's vectorized reader +
  * column pruning + predicate pushdown apply automatically. At 100 TB these
  * tables would be date-partitioned on disk (`partitionBy("date")` on write,
  * cf. reference `sql/schema.sql:452-474` monthly range partitions) so that
  * every date filter in the query layer prunes partitions; nothing in the
  * query code below assumes otherwise.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** `events.ts` normalized to the engine's canonical Long nanos-since-epoch,
    * whatever physical type the parquet carries. Two generations of driver
    * testdata exist: TIMESTAMP(NANOS) (older sandboxes read it as Long via
    * `nanosAsLong`; Spark 4.1.2 no longer honors that config and such files
    * surface as TIMESTAMP_NTZ truncated to µs) and plain timestamp[us]
    * (reads as TIMESTAMP_NTZ directly). DuckDB's oracle reads the same file
    * at µs precision, so epoch-µs is the shared comparison domain either
    * way; every downstream consumer (eventTs/eventDay, the funnel/session/
    * as-of family's `/1000` µs folds) assumes Long ns, so timestamp reads
    * are converted here — `unix_micros * 1000` is exact and overflow-free
    * (µs epochs ≤ ~1.7e15 → ns ≤ ~1.7e18 < Long.Max) under ANSI.
    * The NTZ→LTZ cast interprets wall time in the session zone; the engine
    * contract pins `spark.sql.session.timeZone=UTC` ([[Sessions]]). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      case org.apache.spark.sql.types.TimestampType =>
        raw.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case other =>
        throw new IllegalStateException(s"events.ts: unsupported type $other")
    }
  }

  /** Exact nanos→TimestampType (micros): decimal division (scale 6 covers the
    * /1000 exactly) then floor — no double rounding anywhere near day
    * boundaries. */
  def eventTs(c: Column): Column =
    timestamp_micros(floor(c.cast("decimal(20,0)") / lit(1000)).cast("long"))

  def eventDay(c: Column): Column = to_date(eventTs(c))
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
