package graft.operators

import graft.functions.{PortableHash => PH}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-snapshot reconciliation by partition checksums — the cheap first
  * pass of a 100 TB table compare: before any row-grain diff
  * ([[TableDiff]], the expensive second pass), compare each partition's
  * row count and an ORDER-INDEPENDENT content checksum; only partitions
  * that disagree need the row-level treatment. This is how replicated
  * warehouses verify sync (per-partition digests), and the checksum must
  * be portable — both sides of a reconciliation are rarely the same
  * engine.
  *
  * Checksum: Σ md5Hash60(canonical row string) carried in decimal(38,0) —
  * addition is commutative, so partitioning/order within the snapshot
  * cannot change it, and the hash is the portable md5 family every oracle
  * replays. Collision posture: a 60-bit hash summed over n rows — a
  * DIFFERING partition sneaking an equal sum requires an engineered
  * collision, same trust level as the dedup fingerprints.
  */
object Reconcile {

  /** Per-partition `(n, checksum)` digest of `rows`; `rowCanonical` must
    * deterministically stringify the compared columns. */
  def digest(
      rows: DataFrame,
      partition: Column,
      rowCanonical: Column): DataFrame =
    rows.groupBy(partition.as("part"))
      .agg(count(lit(1)).as("n"),
        sum(PH.md5Hash60(rowCanonical).cast("decimal(38,0)")).as("checksum"))

  /** Reconciliation report: full-outer compare of two digests. Output per
    * partition: `(part, n_a, n_b, match)` — absent side reads 0 rows;
    * `match` = counts AND checksums agree. */
  def reconcile(
      a: DataFrame,
      b: DataFrame,
      partition: Column,
      rowCanonical: Column): DataFrame = {
    val da = digest(a, partition, rowCanonical)
      .select(col("part"), col("n").as("n_a"), col("checksum").as("ck_a"))
    val db = digest(b, partition, rowCanonical)
      .select(col("part"), col("n").as("n_b"), col("checksum").as("ck_b"))
    da.join(db, Seq("part"), "full_outer")
      .select(col("part"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        (coalesce(col("n_a"), lit(0L)) === coalesce(col("n_b"), lit(0L)) &&
          col("ck_a") <=> col("ck_b")).as("match_ok"))
  }
}
