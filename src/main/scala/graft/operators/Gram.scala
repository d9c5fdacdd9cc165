package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

/** Gram matrix (X^T X) over an embedding corpus — the one-pass reduction
  * that feeds PCA / whitening / low-rank projection in an embedding
  * pipeline (the covariance matrix is an affine function of the Gram
  * matrix and the column-mean vector, both computed here).
  *
  * Runs over int8-QUANTIZED vectors ([[Similarity.quantizeInt8]]'s
  * portable `floor(x*scale + 0.5)` formula), so every accumulation is
  * INTEGER arithmetic: the result is exact, order-free, and reproducible
  * bit-for-bit across engines — no floating-point partial-sum
  * nondeterminism anywhere (the repo's decimal-sum policy, solved here by
  * quantization instead of decimals: a dim² decimal buffer would be ~20x
  * the memory and the int8 grid is already the ANN storage format, q48).
  *
  * Scale shape (the treeAggregate pattern as a DataFrame op):
  *  - ONE pass over the corpus; each task folds its vectors into a flat
  *    upper-triangular `Array[Long]` buffer (dim·(dim+1)/2 longs — 16 KiB
  *    at dim 64) via [[GramAggregator]], an `ObjectHashAggregate` with
  *    map-side partial aggregation;
  *  - only the tiny per-partition buffers move: the shuffle is
  *    #partitions · 16 KiB regardless of corpus size — at 100 TB the
  *    plan is identical, just more map tasks;
  *  - no explode: a naive `posexplode(i) × posexplode(j)` formulation
  *    multiplies the corpus by dim² (4096× at dim 64) BEFORE the
  *    aggregate — that is the shape this Aggregator exists to avoid;
  *  - very wide embeddings (dim ≳ 2k, buffer ≳ 16 MiB) should band the
  *    matrix: one such pass per diagonal band of columns, same kernel.
  *
  * Output: one `(i, j, g)` row per upper-triangle cell (i ≤ j), where
  * `g = Σ_vectors q[i]·q[j]`.
  */
object Gram {

  /** One upper-triangle cell of the Gram matrix. */
  case class Cell(i: Int, j: Int, g: Long)

  /** Accumulates Σ v·v^T (upper triangle, flat row-major) over
    * `array<int>` vectors. Buffer is `dim·(dim+1)/2` longs, constant per
    * task and per merge — an adversarially large corpus costs no more
    * buffer than an empty one. Null vectors and wrong-length vectors are
    * rejected (a silent skip would corrupt the statistic). */
  case class GramAggregator(dim: Int)
      extends Aggregator[Seq[Int], Array[Long], Seq[Cell]] {
    require(dim > 0, "dim must be positive")

    private val cells = dim * (dim + 1) / 2

    override def zero: Array[Long] = new Array[Long](cells)

    override def reduce(b: Array[Long], v: Seq[Int]): Array[Long] = {
      require(v != null && v.length == dim,
        s"vector must be non-null with length $dim")
      val a = v.toArray
      var i = 0
      var idx = 0
      while (i < dim) {
        val vi = a(i).toLong
        var j = i
        while (j < dim) {
          b(idx) += vi * a(j)
          idx += 1
          j += 1
        }
        i += 1
      }
      b
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var k = 0
      while (k < cells) { x(k) += y(k); k += 1 }
      x
    }

    override def finish(b: Array[Long]): Seq[Cell] = {
      val out = Seq.newBuilder[Cell]
      var i = 0
      var idx = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          out += Cell(i, j, b(idx))
          idx += 1
          j += 1
        }
        i += 1
      }
      out.result()
    }

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Cell]] =
      ExpressionEncoder[Seq[Cell]]()
  }

  /** Gram matrix of the int8-quantized `vecCol`: quantize (q48's portable
    * formula), fold through [[GramAggregator]], explode the single result
    * row to `(i, j, g)` cells ordered by (i, j). */
  def quantizedGram(emb: DataFrame, idCol: String, vecCol: String, dim: Int): DataFrame = {
    val q = Similarity.quantizeInt8(emb, idCol, vecCol)
      .select(transform(col("qvec"), x => x.cast("int")).as("v"))
    val gram = udaf(GramAggregator(dim), ExpressionEncoder[Seq[Int]]())
    q.agg(gram(col("v")).as("cells"))
      .select(explode(col("cells")).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"), col("c.g").as("g"))
      .orderBy("i", "j")
  }
}
