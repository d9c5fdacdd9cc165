package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the skewed (large) side's key into
  * `saltBuckets` sub-keys and explode the small side across every salt
  * value, so one hot key's rows spread over `saltBuckets` reducers instead
  * of landing on a single straggler task.
  *
  * This is the classic manual remedy for the case AQE's runtime skew-join
  * splitting cannot reach (e.g. a skewed aggregation feeding a join inside
  * one stage, or a deterministic-plan requirement). For the supported join
  * types (inner / left / left_semi / left_anti — i.e. small-side rows are
  * never emitted unmatched) the result is EXACTLY equal to
  * `large.join(small, keys, joinType)` — the salt is an internal column,
  * dropped on output. right/full outer are rejected: the small side is
  * replicated `saltBuckets`x, so every unmatched small-side row would be
  * emitted once per salt value. The small side grows `saltBuckets`x (it
  * must be the dimension/small side; for two huge skewed sides prefer AQE).
  *
  * 100 TB posture: shuffle volume is unchanged on the large side (one pass,
  * now uniformly distributed) and `saltBuckets`x on the small side — the
  * standard trade. Salt derives from a hash of the large side's row via
  * `pmod(xxhash64(...))`, deterministic per row set but uniform.
  */
object SkewJoin {

  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBuckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val jt = joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin supports inner/left/left_semi/left_anti only: '$joinType' would " +
        "emit each unmatched small-side row saltBuckets times (small side is " +
        "replicated across salts)")
    require(!(large.columns ++ small.columns).contains("__salt"),
      "column name __salt is reserved")
    val keyCols = keys.map(col)
    // uniform deterministic salt from the full large-side row hash: rows of
    // the same hot key scatter across buckets
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(saltBuckets.toLong)).cast("int"))
    val exploded = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(exploded, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Variant salting only a known hot-key set (smaller small-side blowup:
    * only hot keys replicate). `hotKeys` are values of `keys.head`. */
  def saltedJoinHotKeys(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      hotKeys: Seq[Any],
      saltBuckets: Int = 16): DataFrame = {
    require(!(large.columns ++ small.columns).contains("__salt"),
      "column name __salt is reserved")
    val hot = col(keys.head).isin(hotKeys: _*)
    val salted = large.withColumn("__salt",
      when(hot, pmod(xxhash64(large.columns.map(col): _*), lit(saltBuckets.toLong))
        .cast("int")).otherwise(lit(0)))
    val exploded = small.withColumn("__salt",
      explode(when(hot, array((0 until saltBuckets).map(lit): _*))
        .otherwise(array(lit(0)))))
    salted.join(exploded, keys :+ "__salt").drop("__salt")
  }

  /** Pre-flight join-size / skew diagnosis — the planning probe run BEFORE
    * committing a 100 TB shuffle join. Exact inner-join output size is
    * `Σ_k n_left(k)·n_right(k)`; this computes it (plus the heaviest keys'
    * shares) from the two per-key COUNT tables, never materializing the
    * join:
    *  - two map-side-combined count aggregates (each side read once);
    *  - the count tables join on the key — at most |distinct keys| rows
    *    move, not |rows|;
    *  - top-`topK` keys by pair contribution via a bounded rank window.
    *
    * Reading the output: `max_key_pairs/total_pairs` near 1 means one key
    * dominates the join — that's the [[saltedJoinHotKeys]] candidate list
    * in `top_keys`; `total_pairs >> max(n_left, n_right)` flags a
    * fan-out join whose output, not input, is the bottleneck.
    *
    * Output: one row — (total_pairs, matched_keys, max_key_pairs,
    * top_keys as `key:pairs|...` ordered by pairs desc then key). */
  def joinSizeEstimate(
      left: DataFrame,
      right: DataFrame,
      key: String,
      topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lc = left.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("__nl"))
    val rc = right.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("__nr"))
    val pairs = lc.join(rc, key)
      .select(col(key).cast("string").as("k"), (col("__nl") * col("__nr")).as("p"))
    // top-k via TakeOrderedAndProject first; the numbering window then
    // sees <= topK rows (bounded domain, single partition intentional)
    val w = Window.partitionBy(lit(0)).orderBy(col("p").desc, col("k"))
    val top = pairs
      .orderBy(col("p").desc, col("k")).limit(topK)
      .withColumn("rk", row_number().over(w))
      .agg(array_join(array_sort(collect_list(
        struct(col("rk"), concat_ws(":", col("k"), col("p")).as("s"))))
        .getField("s"), "|").as("top_keys"))
    pairs.agg(
      coalesce(sum(col("p")), lit(0L)).as("total_pairs"),
      count(lit(1)).as("matched_keys"),
      coalesce(max(col("p")), lit(0L)).as("max_key_pairs"))
      .crossJoin(top)
  }
}
