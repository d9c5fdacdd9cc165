package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for each left row, the single latest right
  * row with `rightTs <= leftTs` on the same key (backward; the forward
  * variant takes the earliest right row with `rightTs >= leftTs`). The
  * canonical operation for joining fact streams to slowly-updating state:
  * trades→quotes, events→feature snapshots, orders→latest price list.
  *
  * Reference analogue: the latest-override-wins composition
  * (`dashboard_app/app.py` latest_overrides CTEs) is the degenerate
  * "as of now" case; this operator generalizes it to per-row timestamps.
  *
  * Spark-first shape (SURVEY.md §7.3 order (a) — composition, no custom
  * plan needed): tag both sides, union, and propagate the last non-null
  * right payload over a (key, ts, side) sort with
  * `last(_, ignoreNulls).over(rowsBetween(-inf, 0))`. ONE shuffle on the
  * join key, sort within partitions, zero range explosion — the naive
  * range join is O(left x right-per-key) pairs and a non-equi join;
  * this is O(left + right) rows shuffled, and survives arbitrarily hot
  * keys (a key's partition holds its own timeline only).
  *
  * 100 TB posture: equivalent to the merge phase of a sort-merge as-of;
  * partitions are bounded by per-key row counts, skewed keys spill to
  * disk in the sort rather than exploding pair-wise. At same ts, the
  * right row sorts BEFORE the left row (side 0 < 1), so `<=`/`>=` are
  * inclusive, matching DuckDB/pandas ASOF semantics.
  *
  * The right side is pre-deduplicated to ONE row per (key, ts) — the max
  * of the payload struct — so results are deterministic in every engine
  * even when the right side has timestamp ties; put a unique column first
  * in `payload` to make that tie-break total.
  */
object AsofJoin {

  /** Backward as-of join (latest right row at-or-before each left row).
    *
    * @param left     probe side; all its columns are preserved
    * @param right    build side; only `keys`, `rightTs`, `payload` are read
    * @param keys     equi-join key columns (same names on both sides)
    * @param leftTs   left ordering column (any orderable type, same type
    *                 as `rightTs`)
    * @param rightTs  right ordering column
    * @param payload  right columns to emit (null when no match); names must
    *                 not collide with left columns
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame =
    asof(left, right, keys, leftTs, rightTs, payload, forward = false)

  /** Forward as-of join (earliest right row at-or-after each left row). */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame =
    asof(left, right, keys, leftTs, rightTs, payload, forward = true)

  private def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      forward: Boolean): DataFrame = {
    require(payload.nonEmpty, "payload must name at least one right column")
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"payload collides with left columns: $collisions")
    // __-prefixed names are internal (`__ts/__side/__p/__m`); a caller column
    // with one of those names would be silently replaced by withColumn and
    // re-emitted wrong — refuse instead (mirrors the payload guard above)
    val reserved = (left.columns ++ payload).filter(_.startsWith("__"))
    require(reserved.isEmpty, s"column names may not start with '__': ${reserved.toSet}")

    // one deterministic right row per (key, ts): max payload struct.
    // SQL-join null semantics: a null join key never matches — drop
    // null-keyed right rows up front (Window.partitionBy would otherwise
    // group them WITH null-keyed left rows and hand those a bogus match);
    // null-keyed LEFT rows survive with a null payload, like a left join.
    val rightRows = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .groupBy((keys.map(col) :+ col(rightTs).as("__ts")): _*)
      .agg(max(struct(payload.map(col): _*)).as("__p"))
      .withColumn("__side", lit(0))
    val leftRows = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    // unionByName fills each side's missing columns (left payload, right's
    // left-only columns) with typed nulls
    val unioned = leftRows.unionByName(rightRows, allowMissingColumns = true)

    // at equal ts the right row must sort before the left row so the match
    // is inclusive; forward scans the timeline in reverse
    val ts = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ts, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col(s"__m.$p").as(p)): _*)
  }
}
