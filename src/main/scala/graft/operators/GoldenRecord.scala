package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survivorship ("golden record") after entity resolution — the warehouse
  * step that follows duplicate-cluster discovery: each cluster of records
  * describing the same real-world entity collapses to ONE canonical row
  * under explicit, deterministic survivorship rules (MDM practice; cf. the
  * reference's canonical-URL dedupe + keep-first merge in its articles
  * ingest, which is the 2-rule special case of this operator).
  *
  * Rules implemented (all standard, all tie-deterministic):
  *   - canonical id      = min member id (stable cluster label),
  *   - categorical attrs = MODE with lexicographic tie-break — two-level
  *     aggregate: count per (cluster, value), then rank (count desc, value
  *     asc) — no collect_list, bounded by distinct values per cluster,
  *   - numeric attrs     = max (or any exact aggregate the caller picks).
  *
  * Scale shape: one shuffle per categorical attribute at the
  * (cluster, value) grain plus the final cluster-grain aggregate — all
  * map-side combined, no row ever carries more than one attribute value,
  * nothing quadratic in cluster size (mode via windowed count beats
  * `mode()`-style sketches at skewed mega-clusters because the heavy grain
  * is (cluster, value), which salting/AQE can split further).
  */
object GoldenRecord {

  /** Mode of `valueCol` per `clusterCol` with (count desc, value asc)
    * tie-break. Returns (clusterCol, out). */
  private def modePerCluster(
      df: DataFrame, clusterCol: String, valueCol: String, out: String): DataFrame = {
    val counted = df.groupBy(col(clusterCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(col("__c").desc, col(valueCol).asc)
    counted.withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)
      .select(col(clusterCol), col(valueCol).as(out))
  }

  /** Collapse `records` (already labeled with a cluster id) to golden rows.
    * `categorical` attrs survive by mode, `numericMax` attrs by max.
    * Output: (cluster, canonical_id, n_members, <categorical...>,
    * <numericMax...>) with categorical outputs named `<attr>_gold`. */
  def goldenRecords(
      records: DataFrame,
      clusterCol: String,
      idCol: String,
      categorical: Seq[String],
      numericMax: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_members") +:
      numericMax.map(c => max(col(c)).as(s"${c}_max"))
    val base = records.groupBy(col(clusterCol).as("cluster"))
      .agg(min(col(idCol)).as("canonical_id"), aggs: _*)
    categorical.foldLeft(base) { (acc, attr) =>
      acc.join(
        modePerCluster(records.withColumnRenamed(clusterCol, "cluster"),
          "cluster", attr, s"${attr}_gold"),
        Seq("cluster"))
    }
  }

  /** Incremental survivorship state: mode maintenance is the part of
    * golden-record upkeep that genuinely needs state — a mode can FLIP
    * when a new batch's votes arrive, so "keep the old winner" is wrong
    * and a full rescan is the thing incrementality exists to avoid. The
    * sufficient statistic is the `(key, value, cnt)` count table: merging
    * a batch is one aggregate over (batch counts ∪ store), never a rescan
    * of history. (Min/max/count base attributes merge trivially —
    * greatest/least/sum of the stored scalars.)
    *
    * Returns the MERGED state, same grain, ready to persist as the next
    * store. */
  def mergeModeState(
      store: DataFrame,
      batch: DataFrame,
      keyCol: String,
      valCol: String,
      cntCol: String = "cnt"): DataFrame = {
    val bc = batch.groupBy(col(keyCol), col(valCol))
      .agg(count(lit(1)).as(cntCol))
    bc.unionByName(store.select(col(keyCol), col(valCol), col(cntCol)))
      .groupBy(col(keyCol), col(valCol))
      .agg(sum(col(cntCol)).as(cntCol))
  }

  /** Mode per key from a `(key, value, cnt)` count state — (cnt desc,
    * value asc) tie-break, the [[modePerCluster]] rule. */
  def modeFromState(
      state: DataFrame,
      keyCol: String,
      valCol: String,
      cntCol: String,
      out: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(cntCol).desc, col(valCol).asc)
    state.withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)
      .select(col(keyCol), col(valCol).as(out))
  }
}
