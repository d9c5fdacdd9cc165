package graft.operators

import graft.functions.{PortableHash => PH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual skew mitigation for the key a q144-style
  * audit flags as structurally hot (and q148 confirms is hot every day):
  * a plain hash join sends ALL rows of the heaviest key to one task, so
  * one straggler partition holds the job hostage at 100 TB. Salting
  * splits each big-side key across `nSalts` sub-partitions by a
  * deterministic per-row salt, replicates the small side `nSalts`× (one
  * `explode(sequence(...))` — a projection, no shuffle of extra data
  * beyond the replication), and joins on (key, salt). Results are
  * row-for-row identical to the plain join — the oracle runs the plain
  * join — while the heaviest key's work now spreads over `nSalts` tasks.
  *
  * The salt must be DETERMINISTIC (retries/speculative tasks must
  * re-derive the same salt or rows duplicate/vanish — the same
  * reproducibility contract as the sampling family): it hashes the
  * caller-chosen `saltBy` columns (pick columns that vary within a key —
  * an id, a timestamp), never `rand()`/`monotonically_increasing_id()`.
  *
  * AQE's skew-join split handles sort-merge stragglers adaptively at
  * TASK granularity; explicit salting remains the tool when the skew is
  * structural and known in advance (it also composes with bucketed
  * storage where AQE cannot re-split). Use `nSalts` ≈ the audit's
  * max_share_ppm · partitions / 1e6.
  *
  * Returns the joined frame with the internal salt column dropped. */
object SaltedJoin {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltBy: Seq[String],
      nSalts: Int): DataFrame = {
    require(nSalts >= 1, "need at least one salt")
    require(saltBy.nonEmpty, "need salt-source columns")
    require(!(big.columns ++ small.columns).contains("__salt"),
      "inputs must not contain the reserved column __salt")
    val saltExpr = pmod(
      PH.md5Hash60(concat_ws("", saltBy.map(col): _*)),
      lit(nSalts.toLong))
    val bigS = big.withColumn("__salt", saltExpr)
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1L))))
    // pin a shuffle join: under a broadcast join there is no partitioning
    // to skew and the salt would be dead weight — salting exists for the
    // case where the small side is too big to broadcast
    bigS.join(smallS.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }
}
