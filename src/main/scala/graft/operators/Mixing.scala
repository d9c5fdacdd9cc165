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

  /** DoReMi-style excess-loss mixture reweighting (Xie et al. 2023,
    * "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    * Pretraining", the Group-DRO update of §3 step 2): domains whose
    * proxy loss exceeds a reference loss get UP-weighted, multiplicative-
    * weights style, with the baseline recomputed under the moving mixture
    * each round — linearized to integer arithmetic so any engine replays
    * it (exp(η·excess) → 1 + η·excess, the standard small-step surrogate).
    *
    * Per-document inputs: a proxy loss and a reference loss (both Long).
    * ONE pass aggregates to the bounded domain grain
    * (n_d, Σ max(loss−ref, 0)); `rounds` driver-side iterations over that
    * |domains|-sized table then run, in ppm fixed point:
    *
    *   me_d       = Σexcess_d·SCALE div n_d          (mean excess, ≥ 0)
    *   α_0,d      = SCALE div D                      (uniform ppm start)
    *   baseline_t = Σ_d α_t,d·me_d div Σ_d α_t,d     (mixture-weighted)
    *   factor_d   = clamp(SCALE + sign·(|me_d − baseline_t| div etaDen),
    *                      SCALE div 100, 2·SCALE)
    *   α'_d       = α_t,d·factor_d div SCALE
    *   α_{t+1,d}  = max(α'_d·SCALE div Σα', 1)       (renormalize)
    *
    * Every division sees non-negative operands (sign outside); iteration
    * order is the sorted domain list, so the unrolled SQL oracle replays
    * the identical Long sequence. Fixed point of the update: α uniform ⇔
    * all me_d equal; otherwise weight flows monotonically toward high-
    * excess domains, capped by the clamp.
    *
    * Scale shape: the per-document table is the 100 TB object and is
    * touched EXACTLY once (map-side-combined aggregate to |domains|
    * rows); the iteration is driver arithmetic on that bounded table
    * (the sqrtTemperatureWeightsPpm / k-means-centroid precedent).
    * Returns one row per domain:
    * `(domain, n_docs, mean_excess_fp, weight_ppm, rank)` — rank 1 =
    * most up-weighted (ties → domain asc). */
  def excessLossMixPpm(
      perDoc: DataFrame,
      domainCol: String,
      lossCol: String,
      refCol: String,
      rounds: Int = 5,
      etaDen: Long = 10000L): DataFrame = {
    require(rounds >= 1 && rounds <= 50, "rounds in [1, 50]")
    require(etaDen >= 1L, "etaDen >= 1")
    val spark = perDoc.sparkSession
    val agg = perDoc
      .select(col(domainCol).cast("string").as("domain"),
        greatest(col(lossCol).cast("long") - col(refCol).cast("long"), lit(0L))
          .as("excess"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n"), sum(col("excess")).as("se"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(agg.nonEmpty, "no domains")
    val d = agg.length
    val me = agg.map { case (_, n, se) => se * Ppm / math.max(n, 1L) }
    // overflow envelope: α stays ≤ 2·Ppm = 2e6 mid-round, so α·me must
    // fit 2^63 → me (mean excess in ppm fixed point) ≤ 4.6e12, i.e. a
    // raw mean excess of ~4.6e6 loss units
    require(me.forall(_ <= 4600000000000L),
      s"excessLossMixPpm envelope: mean excess fp ${me.max} exceeds the " +
        "α·me 2^63 bound (raw mean excess ~4.6e6)")
    var alpha = Array.fill(d)(Ppm / d)
    for (_ <- 1 to rounds) {
      val asum = math.max(alpha.sum, 1L)
      val wsum = alpha.zip(me).map { case (a, m) => a * m }.sum
      val baseline = wsum / asum
      val next = alpha.zip(me).map { case (a, m) =>
        val delta = m - baseline
        val adj = math.abs(delta) / etaDen
        val factor0 = Ppm + (if (delta < 0) -adj else adj)
        val factor = math.max(Ppm / 100, math.min(2 * Ppm, factor0))
        a * factor / Ppm
      }
      val nsum = math.max(next.sum, 1L)
      alpha = next.map(a => math.max(a * Ppm / nsum, 1L))
    }
    val ranked = agg.indices
      .sortBy(i => (-alpha(i), agg(i)._1))
      .zipWithIndex.map { case (i, r) => (i, (r + 1).toLong) }.toMap
    import spark.implicits._
    agg.indices.map { i =>
      (agg(i)._1, agg(i)._2, me(i), alpha(i), ranked(i))
    }.toSeq.toDF("domain", "n_docs", "mean_excess_fp", "weight_ppm", "rank")
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
