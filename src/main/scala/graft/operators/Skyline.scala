package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Skyline / Pareto frontier (Börzsönyi, Kossmann & Stocker, ICDE 2001):
  * the rows not STRICTLY dominated by any other row, where p dominates q
  * iff p ≥ q in every dimension and p > q in at least one (maximization
  * on every dim; flip signs to minimize). The training-data face: the
  * quality/recency/coverage frontier of a corpus or customer base — the
  * rows no other row beats on all axes at once.
  *
  * Distributed shape — the classic two-level decomposition, valid because
  * dominance is transitive and partition-local: the global skyline is a
  * subset of the union of per-partition skylines (a point dominated by
  * anything is dominated by a partition-mate of that thing or the thing
  * itself lands in its partition's skyline).
  *
  *  - Pass 1 (`mapPartitions`, the genuine imperative case — pairwise
  *    dominance has no relational form that isn't a quadratic self-join):
  *    each task keeps the block-nested-loop candidate buffer; output is
  *    that partition's skyline. Expected skyline size under independent
  *    dims is O(log^{d-1} n) (Bentley et al. 1978) — the buffer stays
  *    tiny even for huge partitions; worst case (fully anti-correlated
  *    dims) degrades toward the partition size, which is why pass 2
  *    guards with `maxCandidates`.
  *  - Pass 2: the surviving candidates (⋃ local skylines — ~#partitions ·
  *    polylog rows) collapse to one task for the final filter. The
  *    `maxCandidates` require makes the "skyline is basically the whole
  *    input" degeneracy loud instead of a silent single-task melt.
  *
  * Exactness: dimensions are LONGS (callers pre-scale money to cents,
  * dates to epoch days) — dominance compares are integer, so the result
  * set is engine-exact and the DuckDB NOT EXISTS anti-join replays it.
  */
object Skyline {

  private def dominates(a: Array[Long], b: Array[Long]): Boolean = {
    var ge = true
    var gt = false
    var i = 0
    while (i < a.length && ge) {
      if (a(i) < b(i)) ge = false
      else if (a(i) > b(i)) gt = true
      i += 1
    }
    ge && gt
  }

  /** Block-nested-loop skyline of one iterator: keep a candidate buffer;
    * each point evicts candidates it dominates and joins unless
    * dominated. The final buffer IS the skyline of the block (set-unique
    * regardless of input order; equal-dim duplicates all survive, as
    * strict dominance says they must). */
  private def blockSkyline(
      it: Iterator[(Long, Seq[Long])]): Iterator[(Long, Seq[Long])] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])]
    it.foreach { case (id, dims) =>
      val d = dims.toArray
      var dominated = false
      var i = 0
      while (i < buf.length && !dominated) {
        if (dominates(buf(i)._2, d)) dominated = true
        else if (dominates(d, buf(i)._2)) {
          buf(i) = buf(buf.length - 1)
          buf.dropRightInPlace(1)
        } else i += 1
      }
      if (!dominated) buf += ((id, d))
    }
    buf.iterator.map { case (id, d) => (id, d.toSeq) }
  }

  /** Skyline of `df` maximizing every column of `dimCols` (long-cast).
    * Output: `(idCol, dimCols...)` — the undominated rows. */
  def skylineMax(
      df: DataFrame,
      idCol: String,
      dimCols: Seq[String],
      maxCandidates: Long = 2000000L): DataFrame = {
    require(dimCols.nonEmpty && dimCols.length <= 8, "1-8 dimensions")
    implicit val enc = Encoders.product[(Long, Seq[Long])]
    val ds: Dataset[(Long, Seq[Long])] = df
      .select(col(idCol).cast("long"),
        array(dimCols.map(c => col(c).cast("long")): _*))
      .as[(Long, Seq[Long])]
    // localCheckpoint (eager) rather than persist: the guard count below and
    // the pass-2 final filter BOTH consume the local-skyline union, and the
    // result DataFrame is lazy — a persist dropped in a finally block would
    // be gone before the caller's first action, silently re-running the
    // pass-1 corpus scan. The checkpoint materializes the (tiny,
    // ~#partitions · polylog) candidate set once; pass 2 reads its blocks.
    val local = ds.mapPartitions(blockSkyline).localCheckpoint()
    val nCand = local.count()
    require(nCand <= maxCandidates,
      s"local-skyline union has $nCand rows (> $maxCandidates): " +
        "dimensions are so anti-correlated the skyline is a large " +
        "fraction of the input — a frontier query is the wrong tool here")
    local.repartition(1).mapPartitions(blockSkyline)
      .map { case (id, dims) => (id, dims.toArray) }(
        Encoders.product[(Long, Array[Long])])
      .toDF(idCol, "__dims")
      .select(col(idCol) +: dimCols.zipWithIndex.map { case (c, i) =>
        col("__dims").getItem(i).as(c) }: _*)
  }
}
