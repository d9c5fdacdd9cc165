package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seasonal-robust anomaly detection on daily series — the STL-flavored
  * screen for metrics with a weekly rhythm: a plain MAD gate (q106) flags
  * every weekend as anomalous when traffic dips Saturdays; deseasonalizing
  * against a per-(series, day-of-week) baseline first leaves only
  * genuinely unusual days. Medians/MAD instead of means/σ: one incident
  * day must not drag its own baseline (robustness is the point of the
  * screen).
  *
  *   expected(s, d)  = median over days with the same (series, dow)
  *   residual        = value − expected
  *   anomaly         ⇔ |residual − median(residual_s)| > 3·MAD(residual_s)
  *
  * All three medians run on the scale-safe exact selection kernel
  * ([[Profiling.exactMedianByKey]]) — no value buffering, grouped keys are
  * (series × 7) and (series), both low-cardinality by contract. Doubles
  * appear only in subtraction/comparison — an engine replaying
  * R-7 medians reproduces every flag bit-for-bit.
  */
object Seasonal {

  /** Flag anomalies in `(seriesCol, dayCol epoch-day, valueCol double)`
    * daily rows. Returns the input grain plus
    * `(expected, residual, med_resid, mad, is_anomaly)`. */
  def weeklyRobustAnomalies(
      daily: DataFrame,
      seriesCol: String,
      dayCol: String,
      valueCol: String): DataFrame = {
    val keyed = daily.select(
      col(seriesCol).as("series"), col(dayCol).as("day"),
      col(valueCol).cast("double").as("v"))
      .withColumn("__k", concat(col("series"), lit(":"), pmod(col("day"), lit(7L))))
    val expected = Profiling.exactMedianByKey(keyed, "__k", "v")
      .withColumnRenamed("median", "expected")
    val resid = keyed.join(expected, Seq("__k"))
      .withColumn("residual", col("v") - col("expected"))
    val medResid = Profiling.exactMedianByKey(resid, "series", "residual")
      .withColumnRenamed("median", "med_resid")
    val r2 = resid.join(medResid, Seq("series"))
      .withColumn("__absdev", abs(col("residual") - col("med_resid")))
    val mad = Profiling.exactMedianByKey(r2, "series", "__absdev")
      .withColumnRenamed("median", "mad")
    r2.join(mad, Seq("series"))
      .select(col("series"), col("day"), col("v"),
        col("expected"), col("residual"), col("med_resid"), col("mad"),
        (abs(col("residual") - col("med_resid")) > lit(3.0) * col("mad"))
          .as("is_anomaly"))
  }
}
