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
  * so `div`'s truncation is floor on both engines, and the per-iteration
  * sums run in decimal(38,0) == DuckDB HUGEINT — exact, order-free,
  * engine-portable (the [[PageRank]]/[[Pca]] fixed-point posture; the
  * oracle unrolls the identical recurrence).
  *
  * Scale shape: per iteration two co-partitioned join+map-side-sum pairs
  * over the edge list (scores are the small side — broadcast or
  * co-partitioned at web scale), normalization via ONE lazy 1-row
  * crossJoin each (the A8 max-probe idiom, never a driver action);
  * lineage cut every `checkpointEvery` iterations, the iterative-graph
  * middle ground the repo's PageRank documents.
  */
object Hits {

  /** Returns `(hubs, authorities)`: `(node, score)` each, fixed-point S.
    * Edges are deduplicated; every hub must reach ≥1 authority and vice
    * versa (true by construction for co-occurrence bipartite graphs). */
  def integerHits(
      edges: DataFrame,
      hubCol: String,
      authCol: String,
      iterations: Int = 8,
      scale: Long = 1L << 20,
      checkpointEvery: Int = 3): (DataFrame, DataFrame) = {
    require(iterations >= 1 && iterations <= 64, "iterations in [1, 64]")
    require(scale >= 1024L, "scale too small for meaningful fixed-point")
    val ed = edges.select(col(hubCol).as("h"), col(authCol).as("a"))
      .distinct().localCheckpoint()

    def normalize(raw: DataFrame, node: String): DataFrame = {
      val m = raw.agg(greatest(max(col("raw")), lit(1).cast("decimal(38,0)")).as("m"))
      raw.crossJoin(broadcast(m))
        .select(col(node).as("node"),
          expr(s"CAST((raw * $scale) div m AS BIGINT)").as("score"))
    }

    var auth = ed.select(col("a").as("node")).distinct()
      .withColumn("score", lit(scale))
    var hub: DataFrame = null
    var t = 1
    while (t <= iterations) {
      hub = normalize(
        ed.join(auth.withColumnRenamed("node", "a"), "a")
          .groupBy("h").agg(sum(col("score").cast("decimal(38,0)")).as("raw")),
        "h")
      auth = normalize(
        ed.join(hub.withColumnRenamed("node", "h"), "h")
          .groupBy("a").agg(sum(col("score").cast("decimal(38,0)")).as("raw")),
        "a")
      if (t % checkpointEvery == 0 && t < iterations) {
        hub = hub.localCheckpoint()
        auth = auth.localCheckpoint()
      }
      t += 1
    }
    (hub, auth)
  }
}
