package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 (slowly-changing-dimension type 2) interval builder: turn a change
  * stream `(keys, ts, state...)` into validity intervals
  * `(keys, state..., valid_from, valid_to, is_current)` — one row per state
  * CHANGE, `valid_to` exclusive (= next change's ts, null while current).
  *
  * Reference analogue: `latest_overrides` / `items_effective`
  * (`sql/schema.sql` override history) keep only the latest override per
  * key; SCD2 is the full-history generalization a warehouse needs for
  * point-in-time correctness (and the natural build-side of
  * [[AsofJoin]] / [[RangeJoin.pointsInIntervals]]).
  *
  * Plan shape: ONE hash shuffle on `keys` and one in-partition sort on
  * `(ts, state desc)` shared by all three window passes (same-ts dedup lag,
  * dup-collapse lag, valid_to lead — filters preserve partitioning and
  * ordering, so Spark plans a single Exchange+Sort; pinned in
  * OperatorsSpec). A groupBy-(keys, ts) dedup would map-side-combine but
  * costs a second shuffle — change logs rarely duplicate a timestamp, so
  * the windowed dedup wins. Per-key memory is the key's change count; no
  * driver-side state.
  *
  * Determinism: rows on the same (keys, ts) keep the max state struct
  * (first in the `state desc` sort — put a unique/monotonic column first
  * in `stateCols` to make that tie-break total); consecutive duplicate
  * states compare null-safely, so a state column that is null in both rows
  * still counts as "unchanged".
  */
object Scd2 {

  def buildIntervals(
      changes: DataFrame,
      keys: Seq[String],
      tsCol: String,
      stateCols: Seq[String]): DataFrame = {
    require(stateCols.nonEmpty, "stateCols must be non-empty")
    // __-prefixed names are internal (`__s/__pt/__prev`) and the three
    // interval columns are produced by this operator — an input column with
    // any of those names would be silently clobbered; refuse instead
    val reserved = (keys ++ stateCols :+ tsCol).filter(c =>
      c.startsWith("__") || c == "valid_from" || c == "valid_to" || c == "is_current")
    require(reserved.isEmpty,
      s"column names may not start with '__' or shadow interval outputs: ${reserved.toSet}")
    val withS = changes.select(
      (keys.map(col) :+ col(tsCol) :+ struct(stateCols.map(col): _*).as("__s")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__s").desc)
    withS
      // same-ts dedup: the first row of each ts group is the max state
      .withColumn("__pt", lag(col(tsCol), 1).over(w))
      .filter(col("__pt").isNull || col("__pt") =!= col(tsCol))
      // collapse consecutive duplicate states (change log -> changes only)
      .withColumn("__prev", lag(col("__s"), 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> col("__s")))
      // the next surviving change closes this interval (exclusive)
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(keys.map(col) ++
        stateCols.map(c => col(s"__s.$c").as(c)) ++
        Seq(col(tsCol).as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current")): _*)
  }
}
