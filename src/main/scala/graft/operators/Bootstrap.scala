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
  * embarrassingly-parallel pass: weight, explode ×B, map-side-combined
  * sum at the (group, replicate) grain. No shuffle grows with B beyond
  * the B-fold grain fan-out, and nothing ever materializes a resampled
  * copy of the data.
  *
  * Determinism/portability: ONE [[PortableHash.md5Hash60]] per row, then
  * the i-th replicate's uniform is the i-th [[PortableHash.affine31]]
  * permutation of that base hash (the minhash-signature idiom — 32
  * affines cost ~nothing next to 32 digests, which is what the first cut
  * of this operator paid). The draw is `w = #{k : threshold_k ≤ v}`
  * against PRECOMPUTED integer thresholds `floor(CDF_Poisson(1)(k)·p31)`
  * (k = 0..5, tail truncated at 6 — P(X > 6) ≈ 8·10⁻⁵, identical
  * truncation on both engines). Integer compares only: no runtime
  * transcendentals, no float RNG, the exact same weights in any engine,
  * any partitioning, any run.
  */
object Bootstrap {

  /** `floor(CDF_Poisson(1)(k) · (2^31 − 1))` for k = 0..5: a uniform
    * 31-bit affine value lands below `PoissonCdf31(k)` with probability
    * CDF(k). */
  val PoissonCdf31: Seq[Long] = Seq(
    790015083L, // k=0: 1/e
    1580030167L, // k=1
    1975037709L, // k=2
    2106706890L, // k=3
    2139624185L, // k=4
    2146207644L) // k=5

  /** The thresholds as a DuckDB SQL weight expression over a 31-bit
    * affine-permuted hash expression (for generated oracles). */
  def poissonWeightSql(vExpr: String): String =
    PoissonCdf31.map(t => s"CASE WHEN $vExpr >= $t THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")

  /** DuckDB `(b, a, c)` VALUES rows for the first `b` affine
    * permutations — the oracle's replicate/coefficient table. */
  def affineCoeffValuesSql(b: Int): String =
    (0 until b).map { i =>
      val (a, c) = PortableHash.affineCoeffs(i)
      s"($i, $a, $c)"
    }.mkString(", ")

  /** All `b` deterministic Poisson(1) weights from an ALREADY-HASHED base
    * column: `b` affine permutations, 6 integer compares each — fully
    * codegen'd. Taking the hash as input (not the id) matters: inlining
    * the digest here would copy the md5 subexpression into every array
    * element, and codegen does not reliably common it up — the first cut
    * paid 32 digests per row again. */
  def poissonWeightsFromHash(h: Column, b: Int): Column =
    array((0 until b).map { i =>
      val v = PortableHash.affine31(i, h)
      PoissonCdf31.map(t => when(v >= t, 1).otherwise(0)).reduce(_ + _)
    }: _*)

  /** Convenience single-projection form (tests, small inputs): hash then
    * weights. In a data-sized pipeline, hash in a SEPARATE projection and
    * call [[poissonWeightsFromHash]] so the digest is computed once. */
  def poissonWeights(id: Column, b: Int): Column =
    poissonWeightsFromHash(PortableHash.md5Hash60(id.cast("string")), b)

  /** The MERGEABLE partial-moment form: `(groupCol, replicate, sw, n)`
    * with `sw = Σ w·value` (decimal-exact) and `n = Σ w`. Because the
    * weights are pure functions of each row's id hash, these sums add
    * associatively across any split of the data — the property the
    * streaming face ([[graft.streaming.BootstrapStream]]) builds on. */
  def poissonReplicateSums(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      groupCol: String,
      b: Int): DataFrame = {
    require(b >= 1 && b <= 1024, "replicates in [1, 1024]")
    // hash BEFORE the explode (one digest per row, not per replicate),
    // then per exploded row the i-th affine coefficients come from two
    // literal-array lookups — no 32-wide array materialization (the
    // array+posexplode formulation paid allocation/boxing for every row
    // and benched 2.3x slower than this explode-first shape)
    val as = typedLit((0 until b).map(i => PortableHash.affineCoeffs(i)._1))
    val bs = typedLit((0 until b).map(i => PortableHash.affineCoeffs(i)._2))
    val v = (element_at(as, col("replicate") + 1) *
      col("__h").bitwiseAND(lit(0x7FFFFFFFL)) +
      element_at(bs, col("replicate") + 1)) % lit(PortableHash.P31)
    val w = PoissonCdf31.map(t => when(v >= t, 1).otherwise(0)).reduce(_ + _)
    df.select(col(groupCol),
        col(valueCol).cast("decimal(38,0)").as("__v"),
        PortableHash.md5Hash60(col(idCol).cast("string")).as("__h"))
      .withColumn("replicate", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("__w", w)
      .groupBy(col(groupCol), col("replicate"))
      .agg(
        sum(col("__v") * col("__w").cast("decimal(38,0)")).as("sw"),
        sum(col("__w").cast("long")).as("n"))
  }

  /** B replicate means of an exact integer `valueCol` per `groupCol`:
    * weight per (row, replicate), one map-side-combined sum at the
    * (group, replicate) grain ([[poissonReplicateSums]]); the mean is a
    * single double division of two exact integers at the end.
    * Output: `(groupCol, replicate, mean)`. */
  def poissonReplicateMeans(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      groupCol: String,
      b: Int): DataFrame =
    poissonReplicateSums(df, idCol, valueCol, groupCol, b)
      .select(col(groupCol), col("replicate"),
        (col("sw").cast("double") / col("n").cast("double")).as("mean"))
}
