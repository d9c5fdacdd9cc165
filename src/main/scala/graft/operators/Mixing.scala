package graft.operators

import graft.functions.{PortableHash => PH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain mixing for training corpora: re-weight a multi-source corpus to
  * a target token budget split across sources, by computing per-source
  * deterministic keep-rates and applying the repo's ppm sampler predicate
  * ([[Sampling]] family — md5-keyed, reproducible, engine-replayable).
  *
  * All rate arithmetic is INTEGER (ppm units, BigInt intermediates): the
  * keep-rate a source gets is
  * `min(1e6, ((budget * weight_ppm) / 1e6) * 1e6 / tokens(source))`
  * — floor divisions throughout, so DuckDB (`//`, HUGEINT) and any other
  * engine reproduce the thresholds bit-for-bit; there is no float rate to
  * disagree about.
  *
  * Scale shape: one map-side-combined aggregate for per-source token
  * totals (sources are a small dimension — the collect is centroid-sized),
  * then a pure pushdown filter over the corpus; no shuffle of document
  * rows anywhere.
  */
object Mixing {

  val Ppm = 1000000L

  /** Per-source keep-rates (ppm) for a token budget split by `weightsPpm`
    * (shares in ppm, e.g. uniform = 1e6 / nSources). Sources missing from
    * `weightsPpm` get rate 0. */
  def ratesPpm(
      totals: Map[String, Long],
      budgetTokens: Long,
      weightsPpm: Map[String, Long]): Map[String, Long] =
    weightsPpm.map { case (s, w) =>
      val tk = math.max(totals.getOrElse(s, 0L), 1L)
      val ppm = (BigInt(budgetTokens) * w / Ppm * Ppm / tk).min(BigInt(Ppm))
      s -> ppm.toLong
    }

  /** Filter `docs` to the mixed subset; adds `rate_ppm` with the applied
    * per-source threshold. Deterministic: keep iff
    * `md5Hash60(id) mod 1e6 < rate_ppm(source)`. */
  def mixByTokenBudget(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      tokenCol: String,
      budgetTokens: Long,
      weightsPpm: Map[String, Long]): DataFrame = {
    val totals = docs.groupBy(col(sourceCol)).agg(sum(col(tokenCol)).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = ratesPpm(totals, budgetTokens, weightsPpm)
    val threshold = rates.foldLeft(lit(0L)) { case (acc, (s, p)) =>
      when(col(sourceCol) === s, lit(p)).otherwise(acc)
    }
    docs.withColumn("rate_ppm", threshold)
      .filter(pmod(PH.md5Hash60(col(idCol)), lit(Ppm)) < col("rate_ppm"))
  }

  /** Exact integer floor-sqrt (BigInteger.sqrt, Java 9+): the τ=0.5
    * "square-root temperature" exponent of multilingual/multi-source
    * sampling (Conneau & Lample's p_i ∝ n_i^τ with the common τ=1/2)
    * kept in integer arithmetic so any engine replays it — an oracle
    * reproduces isqrt from floor(sqrt(double)) plus a one-step Newton
    * correction in each direction. */
  def isqrt(n: Long): Long = {
    require(n >= 0, s"isqrt of negative $n")
    java.math.BigInteger.valueOf(n).sqrt().longValueExact()
  }

  /** τ=0.5 temperature weights in ppm: w_s = isqrt(tokens_s),
    * share_ppm(s) = w_s * 1e6 // Σw — up-weights small sources relative
    * to proportional sampling while never inverting the size order; the
    * standard anti-starvation mix for heterogeneous pretraining corpora. */
  def sqrtTemperatureWeightsPpm(totals: Map[String, Long]): Map[String, Long] = {
    val w = totals.map { case (s, n) => s -> isqrt(math.max(n, 0L)) }
    val wsum = math.max(w.values.sum, 1L)
    w.map { case (s, ws) => s -> (BigInt(ws) * Ppm / wsum).toLong }
  }

  /** Temperature-scaled mix (τ=0.5): per-source budget share ∝
    * sqrt(source tokens), then the same integer ppm keep-rate + md5
    * sampler as [[mixByTokenBudget]]. Scale shape unchanged: one
    * map-side-combined source-totals aggregate (the collect is
    * |sources|-sized), then a pure pushdown filter — no document-row
    * shuffle. */
  def mixTemperatureSqrt(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      tokenCol: String,
      budgetTokens: Long): DataFrame = {
    val totals = docs.groupBy(col(sourceCol)).agg(sum(col(tokenCol)).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = sqrtTemperatureWeightsPpm(totals)
    val rates = ratesPpm(totals, budgetTokens, weights)
    val weightCol = weights.foldLeft(lit(0L)) { case (acc, (s, w)) =>
      when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    val threshold = rates.foldLeft(lit(0L)) { case (acc, (s, p)) =>
      when(col(sourceCol) === s, lit(p)).otherwise(acc)
    }
    docs.withColumn("weight_ppm", weightCol)
      .withColumn("rate_ppm", threshold)
      .filter(pmod(PH.md5Hash60(col(idCol)), lit(Ppm)) < col("rate_ppm"))
  }

  /** Uniform-share mix: every source targets `budgetTokens / nSources`
    * tokens (weights = 1e6 / nSources ppm each, floor division — replay
    * this exact arithmetic in oracles). */
  def mixUniform(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      tokenCol: String,
      budgetTokens: Long): DataFrame = {
    val sources = docs.select(col(sourceCol)).distinct()
      .collect().map(_.getString(0))
    val w = Ppm / math.max(sources.length, 1)
    mixByTokenBudget(docs, idCol, sourceCol, tokenCol, budgetTokens,
      sources.map(_ -> w).toMap)
  }
}
