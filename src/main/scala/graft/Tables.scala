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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; `nanosAsLong` (set here defensively and in every session
    * builder) reads it as Long nanos-since-epoch. Keep the raw Long for
    * ordering (full ns precision); convert with [[eventTs]]/[[eventDay]]. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
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
