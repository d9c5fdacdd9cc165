package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering: the trained-classifier face of corpus
  * curation (the fastText/logistic filters of GPT-3 §2.2 / LLaMA appendix
  * pipelines — train a cheap linear model on quality labels, score every
  * document, keep by predicted probability), expressed as full-batch
  * fixed-point gradient descent where EVERY iteration is one aggregate
  * over the feature table.
  *
  * Reference scope: the reference dashboard has no trained models — this
  * is part of the beyond-reference LLM-pipeline surface (SURVEY §2.11),
  * next to the rule-based gates (q62/q89) it upgrades.
  *
  * Integer contract (oracle-replayable, the q120/q250 unrolled-fixed-point
  * idiom): weights live at SCALE=1e6; features are small non-negative
  * Longs (callers normalize to ~[0,100]); the link is the HARD sigmoid
  *
  *   z  = w_0 + Σ_j w_j·x_j                  (Long, exact)
  *   p  = clamp(SCALE/2 + sign(z)·(|z| div 4), 0, SCALE)
  *
  * (piecewise-linear — exactly replayable where exp() is not, and the
  * standard cheap surrogate), the gradient the exact integer sum
  *
  *   g_j = Σ_rows x_j·(y·SCALE − p)          (x_0 ≡ 1)
  *
  * and the update w_j += sign(g_j)·(|g_j| div (n·lrDen)). Every division
  * sees non-negative operands (sign carried outside), so Spark `div` and
  * DuckDB `//` agree. Overflow envelope: rows·maxx·SCALE must stay under
  * 2^63 → with maxx ≤ 100 the gradient sum is exact to ~9e10 rows.
  *
  * Scale posture: the feature table is the 100 TB object; each GD round
  * is one map-side-combined aggregate to a SINGLE row (no shuffle wider
  * than the final combine), and weights travel back as literals — the
  * next round's scan is whole-stage-codegen arithmetic on constants, no
  * join, no broadcast, no driver-held data beyond |features|+1 Longs
  * (the k-means centroid-collect precedent). Iterations are few (full-
  * batch GD on a linear model converges in single digits); callers
  * checkpoint the feature table once instead of recomputing lineage.
  */
object QualityModel {

  /** z and p columns for a weight vector (bias first). */
  private def hardSigmoid(weights: Seq[Long], xs: Seq[Column],
      scale: Long): Column = {
    val z = xs.zip(weights.tail)
      .foldLeft(lit(weights.head).cast("long")) { case (acc, (x, w)) =>
        acc + x * lit(w) }
    // |z| div 4 as a shift: exact integer floor on the non-negative
    // magnitude, no double round-trip
    val mag = shiftright(abs(z), 2)
    val zq = when(z < 0, -mag).otherwise(mag)
    greatest(lit(0L), least(lit(scale), lit(scale / 2) + zq))
  }

  /** Center feature columns on their integer floor means (one bounded
    * aggregate → means travel back as literals): returns the input with
    * each feature replaced by `x_j − (Σx_j div n)` plus the mean vector.
    * Centering is load-bearing for few-round full-batch GD — on raw
    * non-negative features the gradient's E[x_j]·E[resid] term dwarfs
    * the covariance term, so every weight moves with the BASE RATE
    * instead of its feature's signal and the score can anti-correlate
    * with the label until the slow-moving intercept catches up (observed
    * on the q255 corpus: 5 uncentered rounds invert the decile order).
    * Centered, the intercept decouples and the first round already
    * steps along cov(x_j, y). */
  def centerFeatures(
      features: DataFrame,
      featureCols: Seq[String]): (DataFrame, Seq[Long]) = {
    val aggs = count(lit(1)).as("n") +:
      featureCols.zipWithIndex.map { case (c, i) =>
        sum(col(c).cast("long")).as(s"s$i") }
    val row = features.agg(aggs.head, aggs.tail: _*).head()
    val n = math.max(row.getLong(0), 1L)
    val means = featureCols.indices.map { i =>
      val s = row.getLong(i + 1)
      val m = math.abs(s) / n
      if (s < 0) -m else m
    }
    val centered = featureCols.zip(means).foldLeft(features) {
      case (df, (c, m)) => df.withColumn(c, col(c).cast("long") - lit(m))
    }
    (centered, means)
  }

  /** Full-batch hard-sigmoid logistic regression: returns the weight
    * vector (bias first, fixed point at `scale`) after `iterations`
    * rounds. `featureCols` are small Long columns (callers typically
    * [[centerFeatures]] them first); `labelCol` is 0/1. */
  def trainHardSigmoidLr(
      features: DataFrame,
      labelCol: String,
      featureCols: Seq[String],
      iterations: Int = 3,
      lrDen: Long = 10000L,
      scale: Long = 1000000L): Seq[Long] = {
    require(iterations >= 1 && iterations <= 50, "iterations in [1, 50]")
    require(featureCols.nonEmpty, "at least one feature")
    val df = features.select(
      (col(labelCol).cast("long").as("y") +:
        featureCols.zipWithIndex.map { case (c, i) =>
          col(c).cast("long").as(s"x$i") }): _*)
    var w: Seq[Long] = Seq.fill(featureCols.size + 1)(0L)
    for (_ <- 1 to iterations) {
      val xs = featureCols.indices.map(i => col(s"x$i"))
      val resid = col("y") * lit(scale) - hardSigmoid(w, xs, scale)
      val aggs = count(lit(1)).as("n") +: sum(resid).as("g0") +:
        featureCols.indices.map(i => sum(col(s"x$i") * resid).as(s"g${i + 1}"))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      val n = math.max(row.getLong(0), 1L)
      w = w.zipWithIndex.map { case (wj, j) =>
        val g = row.getLong(j + 1)
        val step = math.abs(g) / (n * lrDen)
        wj + (if (g < 0) -step else step)
      }
    }
    w
  }

  /** Score rows with a trained weight vector: input grain plus `p_fp`
    * (hard-sigmoid probability at `scale`). Pure constant arithmetic —
    * stays inside whole-stage codegen. */
  def scoreHardSigmoid(
      features: DataFrame,
      featureCols: Seq[String],
      weights: Seq[Long],
      scale: Long = 1000000L): DataFrame = {
    require(weights.size == featureCols.size + 1, "bias + one weight per feature")
    features.withColumn("p_fp",
      hardSigmoid(weights, featureCols.map(c => col(c).cast("long")), scale))
  }

  /** Reliability deciles over a scored table: bucket = min(p·10 div
    * SCALE, 9), per-bucket judgment count, observed positive rate and
    * mean predicted probability in basis points — the q161/q252
    * calibration readout for the trained filter. One partial-aggregated
    * shuffle to ≤10 keys. */
  def reliabilityDeciles(
      scored: DataFrame,
      labelCol: String,
      pCol: String = "p_fp",
      scale: Long = 1000000L): DataFrame =
    scored
      .select(col(labelCol).cast("long").as("y"), col(pCol).cast("long").as("p"))
      .groupBy(least(expr(s"p * 10L div ${scale}L"), lit(9L)).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("y")).as("positives"),
        sum(col("p")).as("sum_p"))
      .select(col("bucket"), col("n"), col("positives"),
        expr("positives * 10000L div n").as("pos_bp"),
        expr(s"sum_p * 10000L div (n * ${scale}L)").as("avg_pred_bp"))
      .orderBy("bucket")
}
