package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — the change-data-capture compare between two versions of
  * a keyed table (yesterday's gold vs today's rebuild, a migration's
  * before/after, an incremental refresh vs a full recompute).
  *
  * Shape at scale: ONE full-outer hash/sort-merge join on the key — each
  * side shuffles exactly once on the key columns (co-located for free when
  * both snapshots are bucketed by key, the layout [[Layout]] produces), and
  * every comparison is a null-safe column equality inside the join's
  * project — no collect, no per-column passes, no row serialization. The
  * change classification and the changed-column list are plain codegen
  * expressions, so the whole diff is a single exchange pair regardless of
  * how many columns are compared.
  *
  * Output grain: one row per key present in either snapshot —
  * `change ∈ added | removed | changed | unchanged` ("unchanged" rows are
  * dropped unless asked for: at 100 TB the interesting output is the delta,
  * which is small; emitting the full key universe would make the diff as
  * big as the table) and `changed_cols`, the comma-joined sorted list of
  * differing columns (empty for added/removed — there is no counterpart to
  * differ against).
  */
object TableDiff {

  private val OldTag = "__td_o"
  private val NewTag = "__td_n"

  /** Diff `newDf` against `oldDf` at the `keys` grain. Schemas must match
    * exactly (same columns, same order) — a schema change is a migration,
    * not a row diff. Null-safe comparison: null→value and value→null are
    * both "changed"; null==null is equal. */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keys: Seq[String],
      includeUnchanged: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    require(oldDf.columns.toSeq == newDf.columns.toSeq,
      s"schemas must match: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    require(keys.forall(oldDf.columns.contains),
      s"keys $keys must exist in the frames")
    val reserved = oldDf.columns.exists(c => c.startsWith(OldTag) || c.startsWith(NewTag))
    require(!reserved, s"frames must not contain reserved internal columns ($OldTag*/$NewTag*)")

    val compare = oldDf.columns.filterNot(keys.contains).toSeq
    val o = oldDf.select(keys.map(col) ++ compare.map(c => col(c).as(s"${OldTag}_$c"))
      :+ lit(true).as(OldTag): _*)
    val n = newDf.select(keys.map(col) ++ compare.map(c => col(c).as(s"${NewTag}_$c"))
      :+ lit(true).as(NewTag): _*)

    val diffs: Seq[(String, Column)] =
      compare.map(c => c -> !(col(s"${OldTag}_$c") <=> col(s"${NewTag}_$c")))
    val anyDiff = diffs.map(_._2).foldLeft(lit(false))(_ || _)
    val change = when(col(OldTag).isNull, lit("added"))
      .when(col(NewTag).isNull, lit("removed"))
      .when(anyDiff, lit("changed"))
      .otherwise(lit("unchanged"))
    // concat_ws skips nulls, so each column contributes its name iff it
    // differs; added/removed rows have no counterpart to differ against
    val changedCols = when(col(OldTag).isNotNull && col(NewTag).isNotNull,
      concat_ws(",", diffs.map { case (c, d) => when(d, lit(c)) }: _*))
      .otherwise(lit(""))

    val joined = o.join(n, keys, "full_outer")
      .withColumn("change", change)
      .withColumn("changed_cols", changedCols)
    val out = joined.select(keys.map(col) :+ col("change") :+ col("changed_cols"): _*)
    if (includeUnchanged) out else out.where(col("change") =!= "unchanged")
  }
}
