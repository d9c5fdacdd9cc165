package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance at the DELTA grain — the
  * step a "refresh" job should run instead of a rebuild: given the
  * committed aggregate store and a batch of late/new rows, emit one row
  * per AFFECTED group with its old and new value. Groups the batch never
  * touches are never read, never shuffled, never rewritten — at 100 TB
  * the delta is the difference between minutes and a full-table rebuild
  * (the reference refreshes whole materialized views; this is the
  * incremental discipline its date-windowed crisis recompute gestures
  * at).
  *
  * Count-style aggregates are self-maintainable (new = old + add); the
  * emitted `(old_n, new_n, delta_n)` triple doubles as a
  * retraction/insert pair for downstream consumers that need
  * change-stream semantics. */
object ViewMaintenance {

  /** Delta rows for a COUNT view keyed by `keyCols`: `store` holds
    * `(keyCols..., old_n)`, `batch` the raw new rows. Output one row per
    * affected group: `(keyCols..., old_n, new_n, delta_n)` (old_n = 0
    * for groups born in this batch). */
  def countDelta(
      store: DataFrame,
      batch: DataFrame,
      keyCols: Seq[String],
      storeCountCol: String = "old_n"): DataFrame = {
    val add = batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__vm_add"))
    add.join(store, keyCols, "left")
      .select((keyCols.map(col) :+
        coalesce(col(storeCountCol), lit(0L)).as("old_n") :+
        (coalesce(col(storeCountCol), lit(0L)) + col("__vm_add")).as("new_n") :+
        col("__vm_add").as("delta_n")): _*)
  }
}
