package graft.operators

import graft.plans.GraftExtensions
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Diversity-coreset selection over an embedding column — greedy k-center
  * (Gonzalez 1985 farthest-point traversal), the standard 2-approximation
  * for the k-center cover and the usual seed step for diverse training-data
  * subset selection ("pick k maximally-spread exemplars, then assign").
  *
  * Scale shape: the only driver state is the k chosen centers (k is a small
  * constant by contract — it is the OUTPUT size); each selection round is
  * ONE distributed pass — a per-row `least()` fold over the ≤k center
  * literals followed by a TakeOrdered(1) argmax (no shuffle of the corpus,
  * no window). Total work is O(k²·n) cosines, embarrassingly parallel and
  * independent of partitioning. The final assignment pass reuses the
  * shuffle-free [[Similarity.nearestCentroid]] argmax kernel.
  *
  * Every arithmetic step is replayable: dist = `1.0 - cos` on doubles,
  * per-row min over centers is `least()` (order-free), selection argmax
  * breaks ties (dist desc, id asc), assignment argmin breaks ties
  * (dist asc, selection-order asc) — a DuckDB oracle unrolls the k rounds
  * as chained CTEs and matches bit-for-bit.
  */
object Coreset {

  /** Greedy k-center: seed = the row with the smallest id (deterministic),
    * then k-1 rounds of "add the point farthest from its nearest chosen
    * center". Returns the full corpus assignment
    * `(id, center_id, center_rank, dist)` — `center_id` the chosen
    * exemplar's id, `center_rank` its 0-based selection order (the
    * farthest-point traversal prefix property: rank r centers are exactly
    * the greedy solution for k = r+1), `dist` the point's cosine distance
    * to it (centers assign to their own rank; their self-distance is the
    * IEEE `1 - cos(v,v)`, not symbolically 0). Selection compares in the
    * DIST domain (least-of-1-cos, argmax), assignment in the COS domain
    * (the nearestCentroid kernel) — an oracle must mirror that split, the
    * two domains are not ulp-interchangeable. */
  def kCenterAssign(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame =
    assign(emb, idCol, vecCol, selectCenters(emb, idCol, vecCol, k))

  private def distTo(spark: org.apache.spark.sql.SparkSession,
      center: Seq[Float]): Column =
    lit(1.0) - GraftExtensions.cosine(spark, col("vec"),
      array(center.map(lit): _*))

  /** The greedy selection alone: the ordered `(id, vector)` centers. */
  def selectCenters(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): Vector[(Long, Seq[Float])] = {
    require(k >= 1, "k-center needs k >= 1")
    val spark = emb.sparkSession
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val seed = base.orderBy(col("id")).limit(1).collect()(0)
    var centers: Vector[(Long, Seq[Float])] =
      Vector((seed.getLong(0), seed.getSeq[Float](1)))
    for (_ <- 1 until k) {
      val minDist = centers.map(c => distTo(spark, c._2)).reduce(least(_, _))
      val next = base
        .select(col("id"), col("vec"), minDist.as("md"))
        .orderBy(col("md").desc, col("id").asc)
        .limit(1)
        .collect()(0)
      centers = centers :+ ((next.getLong(0), next.getSeq[Float](1)))
    }
    centers
  }

  /** Assignment of ANY point set to previously-chosen centers — the reuse
    * point for incremental coverage monitoring (assign a new batch to the
    * store's centers without re-selecting). Argmax cosine, ties to the
    * earlier-selected center — exactly the nearestCentroid tie rule when
    * centroid ids are selection ranks. */
  def assign(
      points: DataFrame,
      idCol: String,
      vecCol: String,
      centers: Vector[(Long, Seq[Float])]): DataFrame = {
    val spark = points.sparkSession
    val base = points.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val ranked = centers.zipWithIndex.map { case ((_, v), i) => (i, v) }
    val idOf = map(centers.zipWithIndex.flatMap { case ((cid, _), i) =>
      Seq(lit(i), lit(cid)) }: _*)
    val withBucket = base.withColumn("center_rank",
      Similarity.nearestCentroid(spark, col("vec"), ranked))
    val distToAssigned = ranked.init.foldRight(distTo(spark, ranked.last._2)) {
      case ((i, v), acc) =>
        when(col("center_rank") === i, distTo(spark, v)).otherwise(acc)
    }
    withBucket
      .select(col("id"),
        element_at(idOf, col("center_rank")).as("center_id"),
        col("center_rank").cast("int").as("center_rank"),
        distToAssigned.as("dist"))
  }
}
