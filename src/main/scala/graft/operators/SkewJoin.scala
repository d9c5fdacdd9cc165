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
    val hot = col(keys.head).isin(hotKeys: _*)
    val salted = large.withColumn("__salt",
      when(hot, pmod(xxhash64(large.columns.map(col): _*), lit(saltBuckets.toLong))
        .cast("int")).otherwise(lit(0)))
    val exploded = small.withColumn("__salt",
      explode(when(hot, array((0 until saltBuckets).map(lit): _*))
        .otherwise(array(lit(0)))))
    salted.join(exploded, keys :+ "__salt").drop("__salt")
  }
}
