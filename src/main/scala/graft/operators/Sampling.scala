package graft.operators

import graft.functions.{PortableHash => PH}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * Both samplers key on [[PH.md5Hash60]] of the row id, so a sample is (a)
  * reproducible across runs/clusters with no seed state, (b) stable under
  * re-partitioning (the decision depends only on the id), and (c)
  * replayable in any engine with md5 — our DuckDB oracle runs the same
  * predicate. Rates resolve to integer micro-units (ppm) BEFORE the
  * comparison, so there is no float threshold to disagree about.
  *
  * 100 TB posture: a sampler is a pure filter — pushes to the scan, no
  * shuffle, no driver state. (Uniform hash-ordered top-k sampling — q36's
  * shape — complements this with exact-size samples; this one gives exact
  * RATES per class, the usual need when rebalancing a training mix.)
  */
object Sampling {

  val Ppm = 1000000L

  /** Per-stratum deterministic sample: keep a row iff
    * `md5Hash60(id) mod 1e6 < rate(stratum) * 1e6`. Unlisted strata use
    * `defaultRate`. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): DataFrame = {
    def ppm(rate: Double): Long = {
      require(rate >= 0.0 && rate <= 1.0, s"rate out of [0,1]: $rate")
      math.round(rate * Ppm)
    }
    val threshold = rates.foldLeft(lit(ppm(defaultRate))) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(ppm(r))).otherwise(acc)
    }
    df.filter(pmod(PH.md5Hash60(col(idCol)), lit(Ppm)) < threshold)
  }

  /** The same predicate as a DuckDB SQL fragment for generated oracles. */
  def stratifiedSampleSql(
      idExpr: String, strataExpr: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): String = {
    val cases = rates.toSeq.sortBy(_._1).map { case (k, r) =>
      s"WHEN $strataExpr = '$k' THEN ${math.round(r * Ppm)}"
    }.mkString(" ")
    s"((${PH.md5Hash60Sql(idExpr)} % $Ppm) < " +
      s"(CASE $cases ELSE ${math.round(defaultRate * Ppm)} END))"
  }

  /** Deterministic weighted sample of exactly `k` rows, inclusion odds
    * rising with `weightCol` (integer weights >= 1, e.g. token counts):
    * priority = floor((md5Hash60(id) mod 1e9) / w), keep the k smallest
    * (ties by id). A heavy row divides its uniform hash draw by a larger
    * weight, so for thresholds t << 1e9/w the inclusion probability is
    * ~proportional to w — the integer-exact, seedless, engine-replayable
    * stand-in for A-ES exponential jumps (whose u^(1/w) keys would hang
    * float parity on pow/ln).
    *
    * Scale shape: priority is a projection on the scan; "k smallest" is a
    * TakeOrderedAndProject (per-partition bounded heaps, no global sort,
    * no shuffle of the corpus). */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    // exact integer floor division: (a - a mod w) is divisible by w, so the
    // double quotient is an exact integer (values < 2^53) — no float-floor
    // boundary hazard
    val h = pmod(PH.md5Hash60(col(idCol)), lit(1000000000L))
    df.withColumn("priority",
      ((h - pmod(h, col(weightCol))) / col(weightCol)).cast("long"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }
}
