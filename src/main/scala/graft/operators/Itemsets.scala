package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent-itemset mining, the pair step (A-priori §2, Agrawal & Srikant
  * 1994): which items co-occur in the same basket at support ≥ s — the
  * co-purchase / co-click / co-mention matrix every recommender and
  * affinity analysis starts from.
  *
  * The 100 TB hazard is the pair explode: a basket with k items yields
  * k·(k−1)/2 pairs, and a raw self-join on basket id squares the heaviest
  * basket. A-priori's downward-closure property is the control: an item in
  * a frequent PAIR must itself be frequent, so items below support are
  * dropped BEFORE any pair is formed:
  *
  *  1. distinct (basket, item) — multiplicity inside a basket is presence,
  *     not weight; one hash aggregate;
  *  2. item supports — one map-side-combined aggregate at the ITEM grain;
  *     the frequent-item set is small by construction (that's what support
  *     means) → broadcast;
  *  3. frequent-filtered (basket, item) self-joins on basket id with
  *     `item_a < item_b` — both join inputs are the SAME projection, so
  *     the planner shuffles once and reuses the exchange; pair width is
  *     bounded by the per-basket FREQUENT-item count, not basket size;
  *  4. pair supports — one aggregate at the (item_a, item_b) grain,
  *     re-thresholded.
  *
  * For baskets that stay pathological even after the frequent filter
  * (one basket holding most of the frequent set), cap with
  * `maxBasketItems` — baskets wider than the cap are dropped and counted
  * out loud rather than silently squaring an executor.
  */
object Itemsets {

  /** Frequent co-occurring pairs at `minSupport` baskets. Output:
    * `(item_a, item_b, pair_count)` with `item_a < item_b`. */
  def frequentPairs(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long,
      maxBasketItems: Int = Int.MaxValue): DataFrame = {
    require(minSupport >= 1, "minSupport >= 1")
    val bi = df.select(col(basketCol).as("__is_b"), col(itemCol).as("__is_i"))
      .where(col("__is_b").isNotNull && col("__is_i").isNotNull)
      .distinct()
    val frequent = bi.groupBy("__is_i")
      .agg(count(lit(1)).as("__is_n"))
      .where(col("__is_n") >= minSupport)
      .select(col("__is_i").as("__is_fi"))
    val kept0 = bi.join(broadcast(frequent), col("__is_i") === col("__is_fi"), "left_semi")
    val kept =
      if (maxBasketItems == Int.MaxValue) kept0
      else {
        val wide = kept0.groupBy("__is_b").agg(count(lit(1)).as("__is_k"))
          .where(col("__is_k") > maxBasketItems)
          .select(col("__is_b").as("__is_wb"))
        kept0.join(broadcast(wide), col("__is_b") === col("__is_wb"), "left_anti")
      }
    val left = kept.select(col("__is_b"), col("__is_i").as("item_a"))
    val right = kept.select(col("__is_b").as("__is_b2"), col("__is_i").as("item_b"))
    left.join(right,
        col("__is_b") === col("__is_b2") && col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("pair_count"))
      .where(col("pair_count") >= minSupport)
  }
}
