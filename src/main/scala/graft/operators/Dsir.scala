package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** DSIR-style data selection by importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling") — the
  * standard pretraining-corpus curation move: estimate how target-like
  * each raw document is from hashed n-gram bucket distributions, then
  * keep the highest-importance documents. (The reference's curation
  * surface is regex/ratio gates — `text_quality.py` family; this is the
  * distribution-matching generalization a 100 TB pipeline needs.)
  *
  * The paper's weight is `Σ_b f_b(doc)·(log p_target(b) − log p_raw(b))`.
  * This implementation is the LOG-FREE fixed-point reduction, per the
  * repo's engine-exactness policy (the [[PageRank]] precedent — `ln` is a
  * transcendental whose last ulp differs between libm and the JVM, while
  * long `div` replays bit-for-bit in any engine):
  *
  *   bucket score  s_b   = (ct_b · SCALE) div cr_b      (target-likeness
  *                         of bucket b; the constant N_raw/N_target
  *                         normalizer is dropped — it rescales every
  *                         bucket identically, so doc RANKING is
  *                         unchanged)
  *   doc weight    w(d)  = Σ_tokens s_bucket(token)      (exact long sum)
  *   importance(d)       = w(d) / n_tokens(d)            (one IEEE division)
  *
  * Hashing is [[PortableHash.md5Hash60]] `% buckets` — the repo's
  * cross-engine hash family, so the DuckDB oracle rebuilds the identical
  * bucket table.
  *
  * Scale shape (100 TB posture): the bucket distribution table has
  * exactly `buckets` rows — a fixed O(1) broadcast regardless of corpus
  * size (that boundedness is DSIR's whole trick vs. per-n-gram tables);
  * building it is ONE map-side-combined shuffle over the token stream
  * (count + conditional count ride the same aggregate), and scoring is a
  * broadcast join + ONE doc-id shuffle carrying (sum, count) partials.
  * The top-k rank is a single bounded window. Overflow: `ct_b · SCALE`
  * needs `ct_b < 2^62/SCALE` (9.2e12 tokens in the TARGET slice at the
  * default SCALE=1e6) — beyond that, lower SCALE or shard the epoch;
  * ANSI mode makes any violation throw rather than corrupt.
  *
  * Returns `(rank, doc_id, n_tokens, w_sum, importance)` — the `k`
  * most-target-like docs by (importance desc, doc_id).
  */
object Dsir {

  def importanceTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetFilter: Column,
      buckets: Int = 256,
      scale: Long = 1000000L,
      k: Int = 100): DataFrame = {
    require(buckets >= 2, "need at least 2 hash buckets")
    require(scale >= 1000L, "scale too small for meaningful fixed-point")
    require(k >= 1, "k must be positive")
    val toks = docs
      .select(col(idCol).as("doc_id"), targetFilter.as("__tgt"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("tok"))
      .withColumn("__b", PortableHash.md5Hash60(col("tok")) % buckets)
    // O(buckets) distribution table: raw + target counts in one pass
    val dist = toks.groupBy("__b")
      .agg(
        count(lit(1)).as("__cr"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"))
      .withColumn("__s", expr(s"(__ct * ${scale}L) div __cr"))
      .select(col("__b"), col("__s"))
    val scored = toks
      .join(broadcast(dist), Seq("__b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("__s")).as("w_sum"))
      .withColumn("importance", col("w_sum").cast("double") / col("n_tokens"))
      // top-k via sort+limit (TakeOrderedAndProject — per-partition heaps,
      // never a global sort), NOT an unpartitioned rank window (which
      // would drag the whole corpus through one task)
      .orderBy(col("importance").desc, col("doc_id"))
      .limit(k)
    // ranking the k survivors is a bounded single-partition window
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(lit(0))
          .orderBy(col("importance").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("n_tokens"), col("w_sum"),
        col("importance"))
  }
}
