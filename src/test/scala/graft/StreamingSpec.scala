package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.streaming.DailyIngestStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("file stream -> watermarked daily agg -> partition-overwrite gold") {
    val base = Files.createTempDirectory("graft-stream").toString
    val dropDir = s"$base/drops"
    val goldDir = s"$base/gold"
    val ckpt1 = s"$base/ckpt1"

    def mkEvents(rows: Seq[(Long, String, Double)]): Unit =
      rows.map { case (uid, ts, v) => (uid, Timestamp.valueOf(ts), v) }
        .toDF("user_id", "ts", "value")
        .coalesce(1).write.mode("append").parquet(dropDir)

    // delivery 1: two days
    mkEvents(Seq(
      (1L, "2024-05-01 10:00:00", 10.0), (1L, "2024-05-01 12:00:00", 5.0),
      (2L, "2024-05-02 09:00:00", 7.0)))

    val schema = spark.read.parquet(dropDir).schema
    def runOnce(ckpt: String): Unit = {
      val stream = DailyIngestStream.readParquetStream(spark, dropDir, schema)
      val daily = DailyIngestStream.dailyCounts(stream, "ts", Seq("user_id"))
      val q = DailyIngestStream.goldUpsertWriter(daily, goldDir, ckpt).start()
      q.awaitTermination()
    }
    runOnce(ckpt1)

    val gold1 = spark.read.parquet(goldDir)
      .select(col("date").cast("string"), col("user_id"), col("n"),
        col("v").cast("double"))
      .as[(String, Long, Long, Double)].collect().toSet
    assert(gold1 == Set(
      ("2024-05-01", 1L, 2L, 15.0),
      ("2024-05-02", 2L, 1L, 7.0)))

    // delivery 2: a new file lands — same day 2 plus a new day
    mkEvents(Seq(
      (2L, "2024-05-02 18:00:00", 3.0),
      (3L, "2024-05-03 08:00:00", 1.0)))
    runOnce(s"$base/ckpt2") // fresh checkpoint => full recompute (AvailableNow)

    val gold2 = spark.read.parquet(goldDir)
      .select(col("date").cast("string"), col("user_id"), col("n"),
        col("v").cast("double"))
      .as[(String, Long, Long, Double)].collect().toSet
    assert(gold2 == Set(
      ("2024-05-01", 1L, 2L, 15.0),
      ("2024-05-02", 2L, 2L, 10.0),
      ("2024-05-03", 3L, 1L, 1.0)))
  }
}
