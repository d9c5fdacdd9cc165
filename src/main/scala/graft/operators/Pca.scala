package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer-exact top principal direction by power iteration (von Mises &
  * Pollaczek-Geiringer 1929) over the int8-quantized Gram matrix — the
  * dominant-eigenvector primitive behind PCA projection, embedding
  * whitening, and spectral diagnostics of an embedding corpus.
  *
  * Split of labor (the q176/q172 "bounded driver rounds" posture):
  *  - the DISTRIBUTED part is the Gram reduction ([[Gram.quantizedGram]]):
  *    one pass over the corpus, map-side-combined, shuffling only
  *    #partitions × dim²/2 longs — the only stage that grows with data,
  *    and the identical plan at 100 TB;
  *  - the iteration itself runs on the driver over the collected dim×dim
  *    matrix (dim·(dim+1)/2 cells, 2 080 rows at dim 64 — a bounded
  *    collect, NOT a data-sized one) in `BigInt`, because u = G·v grows
  *    with corpus size and a Long matvec would overflow near n ≈ 10⁷
  *    vectors; BigInt == DuckDB HUGEINT semantics, so the oracle unrolls
  *    the identical fixed-point recurrence.
  *
  * Fixed-point recurrence (all integer, order-free, engine-portable — the
  * [[PageRank]] idiom applied to an eigenproblem):
  *
  *   v_0      = (S, S, …, S)                      S = 2^20
  *   u_t      = G · v_{t-1}                       (exact integer matvec)
  *   m_t      = max(max_i |u_t,i|, 1)
  *   v_t,i    = sign(u_t,i) · (|u_t,i| · S) div m_t
  *
  * Division only ever sees non-negative operands, so floor == truncate and
  * DuckDB `//` replays it exactly. Power iteration is sign-ambiguous in
  * theory; with identical deterministic arithmetic both engines land on
  * the same sign, and convergence speed is irrelevant to the compare (both
  * replay the same finite recurrence). The returned growth factor
  * `m_T div S` estimates the dominant eigenvalue of G (uncentered second
  * moment — the PCA-on-correlations variant would subtract the mean dyad
  * first; on zero-centered synthetic embeddings the two directions agree).
  */
object Pca {

  /** Default fixed-point scale for loading components. */
  val Scale: Long = 1L << 20

  /** Power-iterate the (upper-triangular `(i, j, g)`) Gram DataFrame to
    * the dominant eigenvector. Returns the loadings (each in
    * `[-Scale, Scale]`) and the integer eigenvalue estimate `m_T div S`.
    *
    * The collect is bounded by construction: dim·(dim+1)/2 rows
    * regardless of corpus size. */
  def topComponent(
      gram: DataFrame,
      dim: Int,
      scale: Long = Scale,
      iterations: Int = 8): (Array[Long], Long) = {
    require(dim > 0 && dim <= 4096, "dim in [1, 4096]")
    require(iterations >= 1 && iterations <= 64, "iterations in [1, 64]")
    val s = BigInt(scale)
    val m = Array.fill(dim, dim)(BigInt(0))
    gram.select(col("i"), col("j"), col("g")).collect().foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val g = BigInt(r.getLong(2))
      m(i)(j) = g; m(j)(i) = g
    }
    var v = Array.fill(dim)(s)
    var ma = BigInt(1)
    var t = 0
    while (t < iterations) {
      val u = Array.tabulate(dim) { i =>
        var acc = BigInt(0)
        var j = 0
        while (j < dim) { acc += m(i)(j) * v(j); j += 1 }
        acc
      }
      ma = u.iterator.map(_.abs).max.max(BigInt(1))
      v = u.map(x => if (x.signum >= 0) (x * s) / ma else -(((-x) * s) / ma))
      t += 1
    }
    (v.map(_.longValue), (ma / s).longValue)
  }

  /** Exact integer projection of an int8-quantized vector column onto a
    * loading vector: Σ_d q[d]·w[d] through the native codegen dot kernel
    * ([[graft.plans.GraftExtensions.dotLong]]) — longs throughout
    * (|score| ≤ dim·127·S ≈ 2^33 at dim 64), no UDF, no doubles, no
    * interpreted per-element lambdas on the corpus pass. */
  def projectionScore(qvec: Column, loadings: Array[Long]): Column =
    graft.plans.GraftExtensions.dotLong(
      org.apache.spark.sql.SparkSession.active,
      transform(qvec, x => x.cast("long")), typedLit(loadings.toSeq))
}
