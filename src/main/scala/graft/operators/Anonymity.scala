package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity audit (Sweeney 2002) — the governance gate a training-data
  * pipeline runs before a table with person-level quasi-identifiers may
  * ship: every equivalence class over the quasi-identifier projection is
  * sized, and classes smaller than `k` are flagged as re-identification
  * risks. (The reference's data surface carries person-adjacent fields —
  * roster names/boards — which its dashboard exposes only aggregated;
  * this is the audit that proves such an aggregation policy holds.)
  *
  * The whole audit is ONE map-side-combined aggregate on the
  * quasi-identifier key: class grain, never row grain, comes out of the
  * shuffle — at 100 TB the output is bounded by the number of distinct
  * quasi-identifier combinations, and a skewed giant class is exactly the
  * safe case (large n). `risk` = 1/n is one IEEE division.
  *
  * Returns one row per equivalence class: the quasi columns, `n` (class
  * size), `at_risk` (n < k), `risk` (1/n). Compose with a filter on
  * `at_risk` for the suppression list, or aggregate `n` for the
  * suppressed-row budget.
  */
object Anonymity {

  def kAnonymityAudit(
      df: DataFrame,
      quasiCols: Seq[Column],
      quasiNames: Seq[String],
      k: Int): DataFrame = {
    require(quasiCols.nonEmpty && quasiCols.size == quasiNames.size,
      "need one name per quasi-identifier column")
    require(k >= 2, "k-anonymity needs k >= 2")
    val named = quasiCols.zip(quasiNames).map { case (c, n) => c.as(n) }
    df.select(named: _*)
      .groupBy(quasiNames.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
      .withColumn("risk", lit(1.0) / col("n"))
  }
}
