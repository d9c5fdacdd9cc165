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

  /** Item-item cosine similarity over co-occurrence — the classic
    * neighborhood recommender kernel (and the "what belongs together"
    * audit for curriculum/mixture design): with binary basket-item
    * incidence, cos(a,b) = n_ab / √(d_a·d_b). Reported as the exact
    * SQUARED cosine in floor ppm — cos²·10⁶ = n_ab²·10⁶/(d_a·d_b) is pure
    * integer arithmetic (decimal(38,0): n_ab² alone passes long at ~3e9
    * co-occurrences), monotone in cosine, so rankings/thresholds carry
    * over and any engine replays it bit-for-bit, no sqrt anywhere.
    *
    * Scale shape: pairs come from [[frequentPairs]] (support-pruned
    * before pair formation, maxBasketItems flood cap); degrees are one
    * aggregate on the distinct incidence grain, joined back onto the
    * (already support-bounded) pair table. Returns
    * (item_a, item_b, pair_count, d_a, d_b, cos2_ppm). */
  def itemCosine(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long,
      maxBasketItems: Int = Int.MaxValue): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def floorDiv(a: Column, b: Column): Column = (a - pmod(a, b)) / b
    val pairs = frequentPairs(df, basketCol, itemCol, minSupport, maxBasketItems)
    val degrees = df
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__b").isNotNull && col("__i").isNotNull)
      .distinct()
      .groupBy(col("__i")).agg(count(lit(1)).as("__d"))
    pairs
      .join(degrees.toDF("item_a", "d_a"), "item_a")
      .join(degrees.toDF("item_b", "d_b"), "item_b")
      .withColumn("cos2_ppm",
        floorDiv(dec(col("pair_count")) * dec(col("pair_count")) * lit(1000000),
          dec(col("d_a")) * dec(col("d_b"))).cast("long"))
      .select(col("item_a"), col("item_b"), col("pair_count"),
        col("d_a"), col("d_b"), col("cos2_ppm"))
  }
}
