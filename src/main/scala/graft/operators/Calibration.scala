package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Score calibration — turning a ranking score (similarity, quality, gate
  * margin) into a monotone probability estimate, the standard post-hoc step
  * before thresholding a classifier/matcher at scale (Zadrozny & Elkan
  * KDD'02 popularized isotonic calibration; Platt scaling is its parametric
  * sibling).
  *
  * The operator is BINNED isotonic regression: scores land in `bins`
  * equal-width buckets (one distributed aggregate — the only pass over the
  * data), then the monotone fit runs on the ≤`bins` bucket rows. For the
  * fit itself we use the minimax characterization of isotonic L2 regression
  *
  *   iso(i) = max_{j ≤ i} min_{k ≥ i} mean(y[j..k])   (weighted means)
  *
  * evaluated RELATIONALLY over interval prefix-sums — O(bins³) rows, a
  * constant (≤ 32³) regardless of data size, and a plan DuckDB replays
  * verbatim: interval means are `CAST(pos AS DOUBLE)/n` on exact BIGINT
  * sums, and min/max over doubles are rounding-monotone, so both engines
  * produce bit-identical fits. (A pool-adjacent-violators fold computes the
  * same function sequentially; the minimax form is what makes the fit a
  * plan instead of a loop.)
  *
  * Scale shape: one map-side-combined groupBy on the bin id; everything
  * after operates on `bins` rows (broadcast-joined intervals). At 100 TB
  * the heavy side is untouched — calibration cost does not grow with the
  * corpus, only with `bins`.
  */
object Calibration {

  /** Equal-width bin id in [0, bins) for `score` over [lo, hi]; out-of-range
    * scores clamp to the edge bins (floor on doubles — portable). */
  def binId(score: Column, lo: Double, hi: Double, bins: Int): Column =
    least(lit(bins - 1), greatest(lit(0),
      floor((score - lit(lo)) / lit(hi - lo) * lit(bins)).cast("int")))

  /** Binned isotonic calibration of a boolean label against a double score.
    * Input: any DataFrame with `scoreCol` (double) and `labelCol` (boolean).
    * Output: one row per NON-EMPTY bin —
    * `(bin, n, pos, raw_rate, iso_rate)` with `iso_rate` the monotone
    * non-decreasing fit (empty bins carry no weight and are standardly
    * dropped from the PAV sequence). */
  def isotonicCalibration(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      lo: Double,
      hi: Double,
      bins: Int): DataFrame = {
    require(bins >= 1 && bins <= 256, "bins must be in [1, 256]")
    val binned = df
      .select(binId(col(scoreCol), lo, hi, bins).as("bin"),
        col(labelCol).cast("boolean").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("pos"))

    // dense 0-based sequence index over non-empty bins: the isotonic
    // ordering is by bin id; gaps don't matter, only order does
    // bounded domain (<= bins rows) — single partition intentional
    val seq0 = binned.withColumn("i",
      (row_number().over(
        Window.partitionBy(lit(0)).orderBy(col("bin"))) - 1).cast("int"))
    // prefix sums (cum up to and including i)
    val wCum = Window.partitionBy(lit(0)).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = seq0
      .withColumn("cn", sum(col("n")).over(wCum))
      .withColumn("cp", sum(col("pos")).over(wCum))

    val ends = pre.select(col("i").as("k"), col("cn").as("cnk"), col("cp").as("cpk"))
    val starts = pre.select(col("i").as("j"),
      (col("cn") - col("n")).as("cnj0"), (col("cp") - col("pos")).as("cpj0"))
    // interval (j..k) weighted mean on exact integer sums
    val intervals = broadcast(starts).join(broadcast(ends), col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("cpk") - col("cpj0")).cast("double") /
          (col("cnk") - col("cnj0")).cast("double")).as("avg"))

    // inner = min over k >= i (for each start j <= i); outer = max over j
    val idx = pre.select(col("i"))
    val inner = broadcast(idx)
      .join(intervals, col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(min(col("avg")).as("mn"))
    val fit = inner.groupBy("i").agg(max(col("mn")).as("iso_rate"))

    pre.join(fit, Seq("i"))
      .select(col("bin"), col("n"), col("pos"),
        (col("pos").cast("double") / col("n").cast("double")).as("raw_rate"),
        col("iso_rate"))
  }
}
