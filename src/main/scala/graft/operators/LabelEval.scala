package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-evaluation harness operators (reference
  * `scripts/sentiment_bakeoff.py`: samples labeled rows, runs candidate
  * models, writes agreement rates + confusion matrices as golden artifacts).
  * The engine-side pieces are the comparisons: per-label confusion matrix
  * and the overall agreement rate over comparable rows.
  */
object LabelEval {

  /** Confusion matrix: one row per (expected, predicted) with counts and the
    * share within the expected class. */
  def confusionMatrix(df: DataFrame, expected: Column, predicted: Column): DataFrame = {
    val counts = df.groupBy(expected.as("expected"), predicted.as("predicted"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("expected").agg(sum(col("n")).as("class_total"))
    counts.join(totals, "expected")
      .withColumn("class_share", col("n").cast("double") / col("class_total"))
  }

  /** Agreement summary over comparable (both-non-null) rows. */
  def agreement(df: DataFrame, expected: Column, predicted: Column): DataFrame = {
    val comparable = df.filter(expected.isNotNull && predicted.isNotNull)
    comparable.agg(
      count(lit(1)).as("comparable_rows"),
      Rollups.countIf(expected === predicted).as("agreements"))
      .withColumn("agreement_rate",
        col("agreements").cast("double") / col("comparable_rows"))
  }
}
