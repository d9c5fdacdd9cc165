package graft.operators

import graft.plans.GraftExtensions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer-exact Lloyd k-means (Lloyd 1957/1982) over int8-quantized
  * vectors — the canonical iterative-refinement clustering, restricted to
  * integer arithmetic so every engine replays the identical centroid
  * trajectory (floating-point k-means sums coordinates in partition
  * order: non-associative, so two runs can converge to different
  * assignments near Voronoi boundaries — the same failure mode the
  * [[PageRank]]/[[Pca]]/[[Hits]] fixed-point family exists to kill):
  *
  *   points     x·P           (P = 2^10 fixed-point, x the int8 grid)
  *   seed       c_0(i) = x_i·P    for the k smallest ids
  *   assign     cid(x) = argmin_c Σ_d (x_d·P − c_d)², ties → smaller cid
  *   update     c'_d  = sign(Σx_d) · (P·|Σx_d|) div n    (per cluster)
  *
  * The update rounds P·mean toward zero — a ≤1-unit (2^-10 of a grid
  * step) centroid perturbation per round, far below any assignment
  * boundary that matters, and identical in every engine (division only
  * ever sees non-negative operands). Empty clusters keep their previous
  * centroid.
  *
  * Assignment arithmetic runs through the native codegen dot kernel
  * ([[GraftExtensions.dotLong]]) via the expansion
  * `d = P²·(x·x) − 2P·(x·c) + |c|²`: the row self-dot is computed once
  * and `argmin_c d` ≡ `argmin_c (|c|² − 2P·(x·c))` — k tight primitive
  * loops per row, no higher-order-function lambdas in the hot path (the
  * zip_with/aggregate formulation evaluated interpreted per element and
  * was ~30× slower at k = 8).
  *
  * Scale shape: per round ONE corpus pass for assignment (centroids are a
  * broadcast literal — k·dim longs — no join, no UDF) and one
  * map-side-combined per-(cluster, dim) sum (k·dim ≈ 512 keys —
  * combiners collapse it partition-side); the k·dim collect per round is
  * bounded, never data-sized. The classic k-means-at-scale plan.
  */
object KMeans {

  /** Fixed-point scale for centroid coordinates. */
  val P: Long = 1L << 10

  /** `(d, cid)` struct-min over the centroid map — ties break to the
    * smaller cid, deterministically. `xv` must be `array<long>` (the raw
    * int8 grid, unscaled). The cast pins the struct field names (array()
    * element coercion can legally rename them; sorting is positional so
    * the cast is a no-op on values). */
  private def assign(xv: Column, cents: Seq[(Long, Array[Long])]): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    val selfDot = GraftExtensions.dotLong(spark, xv, xv)
    val pick = element_at(
      array_sort(array(cents.map { case (cid, c) =>
        val c2 = c.map(v => v * v).sum // ≤ dim·(127·P)² ≈ 2^40: long-safe
        struct(
          (lit(c2) - lit(2L * P) *
            GraftExtensions.dotLong(spark, xv, typedLit(c.toSeq))).as("e"),
          lit(cid).as("cid"))
      }: _*)), 1).cast("struct<e:bigint,cid:bigint>")
    struct((lit(P * P) * selfDot + pick.getField("e")).as("d"),
      pick.getField("cid").as("cid"))
  }

  /** `iterations` Lloyd rounds from the k-smallest-id seeds; returns the
    * final assignment `(id, cid, dist2)`. `quant` must be
    * [[Similarity.quantizeInt8]] output. */
  def integerLloyd(
      quant: DataFrame,
      idCol: String,
      k: Int,
      iterations: Int = 3,
      dim: Int = 64): DataFrame = {
    require(k >= 1 && k <= 256, "k in [1, 256]")
    require(iterations >= 1 && iterations <= 32, "iterations in [1, 32]")
    // the long-cast is the ONE higher-order function, paid once at
    // materialization — every Lloyd pass reads the checkpointed longs
    val pts = quant.select(col(idCol).cast("long").as("id"),
        transform(col("qvec"), x => x.cast("long")).as("xv"))
      .localCheckpoint()
    var cents: Seq[(Long, Array[Long])] = pts
      .orderBy("id").limit(k)
      .select(col("id"), transform(col("xv"), x => x * lit(P)))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
    // `dim` drives the centroid-update tabulate; a silent mismatch against
    // the actual vector width would truncate/fabricate coordinates and run
    // dotLong over mismatched-length arrays — fail loud instead
    require(cents.forall(_._2.length == dim),
      s"dim=$dim does not match the qvec width ${cents.head._2.length}")
    var t = 0
    while (t < iterations) {
      // one corpus pass: assignment + per-(cluster, dim) coordinate sums;
      // the collect is k·dim rows, bounded by construction
      val sums = pts
        .select(assign(col("xv"), cents).getField("cid").as("cid"),
          posexplode(col("xv")).as(Seq("dimn", "x")))
        .groupBy("cid", "dimn")
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect()
        .map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
        .toMap
      cents = cents.map { case (cid, c) =>
        (cid, Array.tabulate(dim) { d =>
          sums.get((cid, d)) match {
            case Some((sx, n)) =>
              if (sx >= 0) (sx * P) / n else -(((-sx) * P) / n)
            case None => c(d) // empty cluster: keep the previous centroid
          }
        })
      }
      t += 1
    }
    pts.select(col("id"), assign(col("xv"), cents).as("__a"))
      .select(col("id"), col("__a.cid").as("cid"), col("__a.d").as("dist2"))
  }
}
