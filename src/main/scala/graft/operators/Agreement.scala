package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-rater agreement for labeling pipelines — when two annotators
  * (human raters, model-judges, or two deterministic quality gates) label
  * the same items, raw percent-agreement overstates consensus wherever
  * the base rates are skewed; Cohen's kappa (1960) corrects by the
  * agreement expected from the raters' marginals alone. The number a
  * curation pipeline reads before trusting a cheap gate as a proxy for an
  * expensive one.
  *
  * All-integer arithmetic: with the 2×2 confusion counts a (both true),
  * b (A only), c (B only), d (both false), n = a+b+c+d,
  *
  *   po = (a+d)/n,   pe = ((a+b)(a+c) + (c+d)(b+d)) / n²,
  *   κ  = (po − pe)/(1 − pe)
  *       = (n(a+d) − [(a+b)(a+c)+(c+d)(b+d)]) / (n² − [...]) ,
  *
  * reported as floor-ppm over exact decimal(38,0) products (n² and the
  * marginal products overflow a long past ~3e9 items per group — sized
  * for the 100 TB group; DuckDB replays in HUGEINT). κ is null when the
  * denominator is 0 (pe = 1: both raters constant — agreement carries no
  * information).
  *
  * Scale shape: ONE map-side-combined aggregate from the item grain to
  * the |groups|-row confusion table; the kappa arithmetic is a
  * projection on that. No joins, no windows, nothing driver-side. */
object Agreement {

  def cohenKappa(
      df: DataFrame,
      keyCol: String,
      raterA: String,
      raterB: String): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    // floor division valid for NEGATIVE numerators too (kappa < 0 is the
    // worse-than-chance regime): pmod's nonnegative remainder makes
    // (a − pmod(a,b))/b the true floor for positive b
    def floorDiv(a: Column, b: Column): Column = (a - pmod(a, b)) / b
    val a = col(raterA)
    val b = col(raterB)
    val counts = df.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        sum(when(a && b, 1L).otherwise(0L)).as("n_both"),
        sum(when(a && !b, 1L).otherwise(0L)).as("n_a_only"),
        sum(when(!a && b, 1L).otherwise(0L)).as("n_b_only"),
        sum(when(!a && !b, 1L).otherwise(0L)).as("n_neither"))
    val pe = dec(col("n_both") + col("n_a_only")) *
        dec(col("n_both") + col("n_b_only")) +
      dec(col("n_b_only") + col("n_neither")) *
        dec(col("n_a_only") + col("n_neither"))
    counts
      .withColumn("po_ppm",
        floorDiv(dec(col("n_both") + col("n_neither")) * lit(1000000),
          dec(col("n"))).cast("long"))
      .withColumn("__num", dec(col("n")) * dec(col("n_both") + col("n_neither")) - pe)
      .withColumn("__den", dec(col("n")) * dec(col("n")) - pe)
      .withColumn("kappa_ppm",
        when(col("__den") =!= 0,
          floorDiv(col("__num") * lit(1000000), col("__den")).cast("long")))
      .select(col(keyCol), col("n"), col("n_both"), col("n_a_only"),
        col("n_b_only"), col("n_neither"), col("po_ppm"), col("kappa_ppm"))
  }
}
