package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact HITS (Kleinberg 1999, "Authoritative sources in a
  * hyperlinked environment") over a bipartite hub→authority edge list —
  * the mutual-reinforcement twin of [[PageRank]]: a hub is good because
  * it points at good authorities, an authority is good because good hubs
  * point at it.
  *
  *   a_0(v)   = S                              S = 2^20
  *   hraw_t(u) = Σ_{(u,v)∈E} a_{t-1}(v);  h_t = (hraw_t · S) div max hraw_t
  *   araw_t(v) = Σ_{(u,v)∈E} h_t(u);      a_t = (araw_t · S) div max araw_t
  *
  * Max-abs normalization replaces the textbook L2 norm (a square root
  * would leave the integer domain); the two differ by a positive scalar
  * per iteration, which HITS is invariant to. All values are non-negative
  * so `div`'s truncation is floor on both engines — exact, order-free,
  * engine-portable integer sums (the [[PageRank]]/[[Pca]] fixed-point
  * posture; the oracle unrolls the identical recurrence in HUGEINT).
  *
  * Scale shape: per iteration two co-partitioned join+map-side-sum pairs
  * over the edge list (scores are the small side — broadcast or
  * co-partitioned at web scale), normalization via ONE lazy 1-row
  * crossJoin each (the A8 max-probe idiom, never a driver action); the
  * raw-sum table is materialized per half-iteration (see below), which
  * doubles as the iterative-graph lineage cut.
  */
object Hits {

  /** Returns `(hubs, authorities)`: `(node, score)` each, fixed-point S.
    * Edges are deduplicated; every hub must reach ≥1 authority and vice
    * versa (true by construction for co-occurrence bipartite graphs).
    *
    * Each raw-sum table is localCheckpointed BEFORE its max is taken:
    * `normalize` consumes the sums twice (max probe + projection), and
    * without the cut Catalyst re-derives the whole join subtree for each
    * consumer — a 2× expansion per half-iteration that compounds to ~2^T
    * between cuts (the engine-side twin of the oracle's MATERIALIZED
    * lesson; the uncut formulation ran 29 s where this runs seconds).
    * Raw sums accumulate in LONG (a node's in-sum is ≤ indegree·S —
    * overflow needs 2^43 in-edges on one node); the div is widened to
    * decimal only at the node-grain projection, where it is free. */
  def integerHits(
      edges: DataFrame,
      hubCol: String,
      authCol: String,
      iterations: Int = 8,
      scale: Long = 1L << 20): (DataFrame, DataFrame) = {
    require(iterations >= 1 && iterations <= 64, "iterations in [1, 64]")
    require(scale >= 1024L, "scale too small for meaningful fixed-point")
    val ed = edges.select(col(hubCol).as("h"), col(authCol).as("a"))
      .distinct().localCheckpoint()

    def normalize(rawDf: DataFrame, node: String): DataFrame = {
      val r = rawDf.localCheckpoint()
      val m = r.agg(greatest(max(col("raw")), lit(1L)).as("m"))
      r.crossJoin(broadcast(m))
        .select(col(node).as("node"),
          expr(s"(CAST(raw AS DECIMAL(38,0)) * $scale) div m").as("score"))
    }

    // the score side is node-grain — broadcast it so the (much larger)
    // edge list never re-shuffles per iteration; on a graph whose node
    // table outgrows broadcast, drop the hint and bucket both sides on
    // the join key instead (the co-partitioned posture)
    var auth = ed.select(col("a").as("node")).distinct()
      .withColumn("score", lit(scale))
    var hub: DataFrame = null
    var t = 1
    while (t <= iterations) {
      hub = normalize(
        ed.join(broadcast(auth.withColumnRenamed("node", "a")), "a")
          .groupBy("h").agg(sum(col("score")).as("raw")),
        "h")
      auth = normalize(
        ed.join(broadcast(hub.withColumnRenamed("node", "h")), "h")
          .groupBy("a").agg(sum(col("score")).as("raw")),
        "a")
      t += 1
    }
    (hub, auth)
  }
}
