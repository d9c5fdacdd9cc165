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
}
