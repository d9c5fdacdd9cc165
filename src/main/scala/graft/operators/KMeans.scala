package graft.operators

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
  * Scale shape: per round ONE corpus pass for assignment (centroids are a
  * broadcast literal — k·dim longs — folded in codegen'd `zip_with`/
  * `aggregate`, no join, no UDF) and one map-side-combined per-(cluster,
  * dim) sum (k·dim ≈ 512 keys — combiners collapse it partition-side);
  * the k·dim collect per round is bounded, never data-sized. The classic
  * k-means-at-scale plan.
  */
object KMeans {

  /** Fixed-point scale for centroid coordinates. */
  val P: Long = 1L << 10

  private def distTo(qvec: Column, c: Array[Long]): Column =
    aggregate(
      zip_with(qvec, typedLit(c.toSeq),
        (x, cc) => { val t = x.cast("long") * lit(P) - cc; t * t }),
      lit(0L), (acc, x) => acc + x)

  /** Assignment column: `(dist, cid)` struct-min over the centroid map —
    * ties break to the smaller cid, deterministically. The final cast
    * pins the field names (array() element coercion can legally rename
    * struct fields to col1/col2; sorting is positional so the cast is a
    * no-op on values). */
  private def assign(qvec: Column, cents: Seq[(Long, Array[Long])]): Column =
    element_at(
      array_sort(array(cents.map { case (cid, c) =>
        struct(distTo(qvec, c).as("d"), lit(cid).as("cid"))
      }: _*)), 1).cast("struct<d:bigint,cid:bigint>")

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
    val pts = quant.select(col(idCol).cast("long").as("id"), col("qvec"))
      .localCheckpoint()
    var cents: Seq[(Long, Array[Long])] = pts
      .orderBy("id").limit(k)
      .select(col("id"), transform(col("qvec"), x => x.cast("long") * lit(P)))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
    var t = 0
    while (t < iterations) {
      // one corpus pass: assignment + per-(cluster, dim) coordinate sums;
      // the collect is k·dim rows, bounded by construction
      val sums = pts
        .select(assign(col("qvec"), cents).getField("cid").as("cid"),
          posexplode(col("qvec")).as(Seq("dimn", "x")))
        .groupBy("cid", "dimn")
        .agg(sum(col("x").cast("long")).as("sx"), count(lit(1)).as("n"))
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
    pts.select(col("id"), assign(col("qvec"), cents).as("__a"))
      .select(col("id"), col("__a.cid").as("cid"), col("__a.d").as("dist2"))
  }
}
