package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson bootstrap (Chamandy et al. 2012, "Estimating uncertainty for
  * massive data streams" — the Google formulation; Efron 1979 for the
  * classic resample) — THE distributed bootstrap: instead of drawing n
  * rows with replacement B times (which needs global coordination), each
  * row independently receives a Poisson(1) replicate weight per resample.
  * Multinomial(n, 1/n) → Poisson(1) is exact in distribution as n → ∞,
  * and independence per row is what makes the whole thing one
  * embarrassingly-parallel pass: explode ×B, weight, map-side-combined
  * sum at the (group, replicate) grain. No shuffle grows with B beyond
  * the B-fold grain fan-out, and nothing ever materializes a resampled
  * copy of the data.
  *
  * Determinism/portability: the per-(row, replicate) weight is a pure
  * function of [[PortableHash.md5Hash60]] — the draw is
  * `w = #{k : threshold_k ≤ h}` against PRECOMPUTED integer thresholds
  * `floor(CDF_Poisson(1)(k)·2^60)` (k = 0..5, tail truncated at 6 —
  * P(X > 6) ≈ 8·10⁻⁵, identical truncation on both engines). Integer
  * compares only: no runtime transcendentals, no float RNG, the exact
  * same weights in any engine, any partitioning, any run.
  */
object Bootstrap {

  /** `floor(CDF_Poisson(1)(k) · 2^60)` for k = 0..5. A 60-bit uniform
    * hash h lands below `PoissonCdf60(k)` with probability CDF(k). */
  val PoissonCdf60: Seq[Long] = Seq(
    424136118829305344L, // k=0: 1/e
    848272237658610688L, // k=1
    1060340297073263360L, // k=2
    1131029650211480960L, // k=3
    1148701988496035328L, // k=4
    1152236456152946176L) // k=5

  /** The same thresholds as a DuckDB SQL weight expression over a 60-bit
    * hash expression (for generated oracles). */
  def poissonWeightSql(hashExpr: String): String =
    PoissonCdf60.map(t => s"CASE WHEN $hashExpr >= $t THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")

  /** Deterministic Poisson(1) weight for (row id, replicate). */
  def poissonWeight(id: Column, replicate: Column): Column = {
    val h = PortableHash.md5Hash60(
      concat(id.cast("string"), lit(":"), replicate.cast("string")))
    PoissonCdf60.map(t => when(h >= t, 1).otherwise(0))
      .reduce(_ + _)
  }

  /** B replicate means of an exact integer `valueCol` per `groupCol`:
    * explode ×B (`replicate` 0..B-1), Poisson-weight, one
    * map-side-combined sum at the (group, replicate) grain. Weighted sums
    * stay integer (decimal(38,0) — engine-exact, order-free); the mean is
    * a single double division of two exact integers at the end.
    * Output: `(groupCol, replicate, mean)`. */
  def poissonReplicateMeans(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      groupCol: String,
      b: Int): DataFrame = {
    require(b >= 1 && b <= 1024, "replicates in [1, 1024]")
    df.select(col(groupCol), col(idCol).as("__id"),
        col(valueCol).cast("decimal(38,0)").as("__v"))
      .withColumn("replicate", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("__w", poissonWeight(col("__id"), col("replicate")))
      .groupBy(col(groupCol), col("replicate"))
      .agg(
        sum(col("__v") * col("__w").cast("decimal(38,0)")).as("__sw"),
        sum(col("__w").cast("long")).as("__n"))
      .select(col(groupCol), col("replicate"),
        (col("__sw").cast("double") / col("__n").cast("double")).as("mean"))
  }
}
