package graft.operators

import graft.functions.{PortableHash => PH}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable bloom filter as a RELATION — the cross-engine twin of
  * [[BloomPrune]]: where that one wraps Spark's native sketch (fast, but
  * its bitset hashing is engine-private), this one derives every bit
  * position from the portable md5 hash family, and represents the filter
  * as the distinct SET of set positions. Any engine that can hash a
  * string can build, probe, or audit the same filter — which is exactly
  * what a filter shared between engines (Spark writer, DuckDB/warehouse
  * reader, or an oracle) needs.
  *
  * Position j of key x: `md5Hash60(j || ':' || x) mod m` — k independent
  * draws via the salt prefix. The position set is ≤ m rows (m is chosen
  * ~16n/ln2-ish like any bloom sizing) — broadcastable metadata, the same
  * class as a centroid table.
  *
  * The false-positive-rate AUDIT is the honest counterpart of the
  * textbook `(1−e^{−kn/m})^k` formula: probe keys KNOWN absent, count how
  * many pass all k probes. Observed counts only — the formula's
  * transcendentals don't replay bit-for-bit across engines, and the
  * observed rate is what capacity planning actually needs.
  */
object PortableBloom {

  /** k salted bit positions of `key` (any type; canonicalized via string
    * cast inside md5Hash60) in a filter of `m` bits. */
  def positions(key: Column, m: Int, k: Int): Column =
    array((0 until k).map { j =>
      pmod(PH.md5Hash60(concat(lit(j.toString), lit(":"), key.cast("string"))),
        lit(m.toLong))
    }: _*)

  /** The filter: distinct set positions of `keys`. ≤ m rows. */
  def build(dim: DataFrame, key: Column, m: Int, k: Int): DataFrame =
    dim.select(explode(positions(key, m, k)).as("pos")).distinct()

  /** Audit report (one row): build the filter from `dim`, probe with
    * `probes` (caller guarantees these keys are absent from `dim`), count
    * the false positives. Output: `(m, k, n_build, n_bits_set, n_probe,
    * n_false_positive, fpr)`. */
  def fprReport(
      dim: DataFrame,
      dimKey: Column,
      probes: DataFrame,
      probeKey: Column,
      m: Int,
      k: Int): DataFrame = {
    val filter = build(dim, dimKey, m, k)
    val probed = probes
      .select(probeKey.as("__pb_key"),
        explode(positions(probeKey, m, k)).as("pos"))
      .join(broadcast(filter.withColumn("__pb_hit", lit(1L))), Seq("pos"), "left")
      .groupBy(col("__pb_key"))
      .agg((count(lit(1)) === sum(coalesce(col("__pb_hit"), lit(0L))))
        .as("__pb_maybe"))
    val nBuild = dim.select(dimKey).distinct().count()
    val nBits = filter.count()
    probed.agg(
      lit(m).as("m"), lit(k).as("k"),
      lit(nBuild).as("n_build"), lit(nBits).as("n_bits_set"),
      count(lit(1)).as("n_probe"),
      Rollups.countIf(col("__pb_maybe")).as("n_false_positive"),
      (Rollups.countIf(col("__pb_maybe")).cast("double") /
        count(lit(1)).cast("double")).as("fpr"))
  }
}
