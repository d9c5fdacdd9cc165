package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting / local clustering coefficients on an undirected
  * edge list, via degree-ordered orientation (Suri & Vassilvitskii,
  * "Counting Triangles and the Curse of the Last Reducer", WWW'11 — the
  * published MapReduce scheme; also Schank & Wagner's forward algorithm).
  *
  * The naive wedge join `E ⋈ E ⋈ E` explodes on hub nodes: a degree-D
  * node contributes D² wedges. Orienting every edge from the LOWER
  * (degree, id) endpoint to the higher caps every node's out-degree at
  * O(√m) on any graph (a node of out-degree k has k neighbors of degree
  * ≥ its own, so deg·outdeg ≤ 2m), which bounds the wedge stage at
  * O(m^{3/2}) total — the curse-of-the-last-reducer fix. Each triangle
  * is generated exactly once, at its lowest-ordered vertex.
  *
  * Scale shape: two map-side-combined shuffles for degrees and counts,
  * one self-join on the wedge apex (shuffle on node id), one closing-edge
  * equi-join on `(v, w)`. No window functions, no driver state; hub skew
  * is structurally removed by the orientation rather than patched by
  * salting.
  *
  * Input: one row per undirected edge with `srcCol < dstCol`, deduped.
  * Output: `(node, degree, triangles, clustering)` for every node in the
  * edge list; `clustering = 2·T / (deg·(deg−1))` (exact integer ratio,
  * 0.0 for degree-1 nodes).
  */
object Triangles {

  def nodeTriangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val reserved = Set("node", "degree", "triangles", "clustering",
      "__k", "__ku", "__kv", "u", "v", "w")
    require(!edges.columns.exists(reserved),
      s"edges must not contain reserved columns ${reserved.mkString("/")}")

    val e = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))

    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

    // Total-order key: (degree, id) packed into one long — ids must fit
    // 32 bits, degrees 31; both hold for any graph a single join builds.
    val key = col("degree") * lit(4294967296L) + col("node")
    val keyed = deg.select(col("node"), key.as("__k"))

    val oriented = e
      .join(keyed.withColumnRenamed("node", "u").withColumnRenamed("__k", "__ku"), "u")
      .join(keyed.withColumnRenamed("node", "v").withColumnRenamed("__k", "__kv"), "v")
      .select(
        when(col("__ku") < col("__kv"), col("u")).otherwise(col("v")).as("u"),
        when(col("__ku") < col("__kv"), col("v")).otherwise(col("u")).as("v"),
        when(col("__ku") < col("__kv"), col("__kv")).otherwise(col("__ku")).as("__kv"))

    // Wedges at the lowest-ordered vertex; the leg order (kv < kw) makes
    // the closing candidate an ORIENTED edge, so one equi-join closes it.
    val wedges = oriented.select(col("u"), col("v"), col("__kv"))
      .join(oriented.select(col("u"), col("v").as("w"), col("__kv").as("__kw")), "u")
      .where(col("__kv") < col("__kw"))
      .select("u", "v", "w")

    val triangles = wedges
      .join(oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))

    val perNode = triangles
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))

    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          (coalesce(col("triangles"), lit(0L)) * 2L).cast("double") /
            (col("degree") * (col("degree") - 1L)).cast("double"))
          .otherwise(lit(0.0d)).as("clustering"))
  }

  /** Common-neighbor link prediction: score unordered node pairs by how
    * many neighbors they share (the classic CN / neighborhood-Jaccard
    * signal — Liben-Nowell & Kleinberg's baseline that harder methods are
    * measured against; in a dedup graph, high-CN non-edges are the
    * "transitively similar" pairs LSH missed).
    *
    * Counting common neighbors genuinely requires a wedge per (apex,
    * pair); a degree-D hub apex contributes D²/2 wedges — that is the real
    * work, not an artifact. The standard scale control is SUPER-NODE
    * EXCLUSION: apexes above `maxApexDegree` don't generate wedges (a hub
    * shared by everything carries no discriminative signal anyway — same
    * rationale as the LSH `maxBucket` flood caps). `common_neighbors` and
    * `jaccard` therefore count capped apexes only; `deg_a`/`deg_b` stay
    * FULL degrees — the cap's effect is visible, not hidden.
    *
    * Output: `(id_a, id_b, common_neighbors, deg_a, deg_b, jaccard,
    * is_edge)` for pairs with `common_neighbors >= minCommon`,
    * `jaccard = cn / (deg_a + deg_b − cn)`, id_a < id_b.
    *
    * Input hygiene is enforced here, not assumed: edges are canonicalized
    * (least, greatest), self-loops dropped, and duplicates collapsed —
    * a row repeated or present in both orientations would otherwise
    * silently inflate degrees, common-neighbor counts, and jaccard. */
  def commonNeighborPairs(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxApexDegree: Long = 128L,
      minCommon: Long = 2L): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("__su"), col(dstCol).cast("long").as("__sv"))
      .where(col("__su") =!= col("__sv"))
      .select(least(col("__su"), col("__sv")).as("u"),
        greatest(col("__su"), col("__sv")).as("v"))
      .distinct()

    val adj = e.select(col("u").as("apex"), col("v").as("nb"))
      .unionAll(e.select(col("v").as("apex"), col("u").as("nb")))
    val deg = adj.groupBy(col("apex").as("node"))
      .agg(count(lit(1)).as("degree"))

    val capped = adj
      .join(deg.withColumnRenamed("node", "apex"), "apex")
      .where(col("degree") <= maxApexDegree)
      .select(col("apex"), col("nb"))

    val wedges = capped.toDF("apex", "a")
      .join(capped.toDF("apex", "b"), "apex")
      .where(col("a") < col("b"))
    val cn = wedges.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common_neighbors"))
      .where(col("common_neighbors") >= minCommon)

    val isEdge = e.select(col("u").as("a"), col("v").as("b"))
      .withColumn("__e", lit(true))
    cn
      .join(deg.toDF("a", "deg_a"), "a")
      .join(deg.toDF("b", "deg_b"), "b")
      .join(isEdge, Seq("a", "b"), "left")
      .select(col("a").as("id_a"), col("b").as("id_b"),
        col("common_neighbors"), col("deg_a"), col("deg_b"),
        (col("common_neighbors").cast("double") /
          (col("deg_a") + col("deg_b") - col("common_neighbors")).cast("double"))
          .as("jaccard"),
        coalesce(col("__e"), lit(false)).as("is_edge"))
  }
}
