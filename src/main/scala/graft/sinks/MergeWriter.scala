package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generalized MERGE/upsert semantics over plain parquet tables — the
  * reference's `insert ... on conflict (keys) do update set ...` family
  * (S12), which appears in three flavors:
  *
  *  - plain overwrite: `col = excluded.col`
  *    (`src/ingest_v2.py:360-371`, summaries upsert `app.py:5820-5831`)
  *  - coalesce-preserving: `col = coalesce(excluded.col, old.col)` — a new
  *    NULL never clobbers an existing value (`src/ingest_v2.py:372-374`)
  *  - seen-window folds: `first_seen = least(...)`, `last_seen =
  *    greatest(...)` (`src/ingest_v2.py:195-222`)
  *  - conditional update: take the new row only when it is at least as new
  *    (`where excluded.edited_at >= target.edited_at`, `sql/schema.sql:426-432`)
  *
  * Implemented as one full-outer join per batch keyed on the conflict keys —
  * the pure-parquet equivalent of Delta `MERGE INTO ... WHEN MATCHED THEN
  * UPDATE`. At scale the join shuffles on the key (or broadcasts the batch
  * when small) and the result is written back with dynamic partition
  * overwrite of the affected partitions only — never a full-table rewrite.
  */
object MergeWriter {

  /** Column treatment for a merge, mirroring the upsert flavors above.
    * Any target column not named here keeps the EXISTING row's value on
    * update and takes the batch value on insert.
    *
    * @param keys conflict key (unique in `existing`)
    * @param overwrite `col = excluded.col`
    * @param coalescePreserving `col = coalesce(excluded.col, old.col)`
    * @param minOf `col = least(old, new)` (nulls ignored)
    * @param maxOf `col = greatest(old, new)` (nulls ignored)
    * @param updateOnlyIfNewerBy when set, the MATCHED-branch update applies
    *        only if `batch.col >= existing.col` (reference conditional
    *        upsert); rows failing the guard keep the existing values
    * @param batchOrder when the batch can carry several rows per key,
    *        latest-wins dedup order within the batch (Postgres applies rows
    *        sequentially — the last surviving write wins); REQUIRED then
    */
  final case class MergeSpec(
      keys: Seq[String],
      overwrite: Seq[String] = Nil,
      coalescePreserving: Seq[String] = Nil,
      minOf: Seq[String] = Nil,
      maxOf: Seq[String] = Nil,
      updateOnlyIfNewerBy: Option[String] = None,
      batchOrder: Seq[Column] = Nil)

  def merge(existing: DataFrame, batch: DataFrame, spec: MergeSpec): DataFrame = {
    val keyCols = spec.keys
    val dataCols = existing.columns.filterNot(keyCols.contains).toSeq
    require(batch.columns.toSet == existing.columns.toSet,
      s"schema mismatch: ${batch.columns.mkString(",")} vs ${existing.columns.mkString(",")}")

    // intra-batch latest-wins (deterministic; never physical row order)
    require(!batch.columns.exists(_.startsWith("__")),
      "__-prefixed column names are reserved by MergeWriter")
    val b0 = if (spec.batchOrder.nonEmpty) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*).orderBy(spec.batchOrder: _*)
      batch.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
    } else batch

    val t = existing.select(
      (keyCols.map(col) ++ dataCols.map(c => col(c).as(s"__t_$c")) :+
        lit(true).as("__t_present")): _*)
    val b = b0.select(
      (keyCols.map(col) ++ dataCols.map(c => col(c).as(s"__b_$c")) :+
        lit(true).as("__b_present")): _*)

    val joined = t.join(b, keyCols, "full_outer")
    val inserted = col("__t_present").isNull // key only in batch
    val takeNew = spec.updateOnlyIfNewerBy match {
      // Postgres semantics: `excluded.ts >= target.ts` is NULL (-> no
      // update) when EITHER side is NULL — a batch row without a timestamp
      // never overwrites, and a target row without one is never overwritten
      case Some(ts) => coalesce(col(s"__b_$ts") >= col(s"__t_$ts"), lit(false))
      case None => lit(true)
    }
    val updated = col("__b_present").isNotNull && !inserted && takeNew

    def out(c: String): Column = {
      val tC = col(s"__t_$c"); val bC = col(s"__b_$c")
      val onUpdate =
        if (spec.overwrite.contains(c)) bC
        else if (spec.coalescePreserving.contains(c)) coalesce(bC, tC)
        else if (spec.minOf.contains(c)) least(tC, bC)
        else if (spec.maxOf.contains(c)) greatest(tC, bC)
        else tC
      when(inserted, bC).when(updated, onUpdate).otherwise(tC).as(c)
    }
    joined.select((keyCols.map(col) ++ dataCols.map(out)): _*)
  }
}
