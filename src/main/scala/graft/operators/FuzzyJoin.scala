package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy resolution — record linkage when BOTH sides are large.
  *
  * The reference's fuzzy resolve (K6, `functions/TextLookup`) scores a
  * probe against a broadcast-sized catalog — correct until the catalog is
  * itself corpus-scale (merging two customer files, linking crawl domains
  * to a registry). The classic answer is blocking (Fellegi–Sunter /
  * Newcombe): a cheap deterministic key partitions both sides, candidates
  * form only WITHIN a block, and the expensive string score runs on the
  * block-bounded candidate set — never the cross product.
  *
  * Shape: one shuffle per side on the block key; per-probe ranking is a
  * `row_number` window partitioned by probe (bounded by the block's
  * candidate count, and the `rnk = 1` filter pushes a WindowGroupLimit so
  * ranks never materialize past the best). Flooded blocks (a degenerate
  * key holding half the catalog) are dropped OUT LOUD via `maxBlock` —
  * the [[Itemsets]]/bucketPairs contract: skew is refused, not absorbed.
  *
  * The score is normalized Levenshtein similarity
  * (`1 − lev(a,b) / max(|a|,|b|)`) — identical by construction in Spark
  * and DuckDB (q44 precedent), so the whole blocked pipeline replays as
  * SQL. Recall caveat (inherent to prefix blocking, documented not
  * hidden): a typo INSIDE the block key's prefix moves the record to
  * another block and the pair is never considered; widen recall with
  * multi-key blocking (union several cheap keys) when that matters.
  */
object FuzzyJoin {

  /** Resolve each distinct probe string to its best catalog match within
    * the shared block (prefix-`blockChars` of the lowercased string), at
    * `threshold` minimum similarity. Output: `(q, resolved, score)`. */
  def blockedResolve(
      probes: DataFrame,
      pCol: String,
      catalog: DataFrame,
      cCol: String,
      threshold: Double = 0.5,
      blockChars: Int = 2,
      maxBlock: Int = 100000): DataFrame = {
    val p = probes.select(col(pCol).as("q"))
      .where(col("q").isNotNull).distinct()
      .withColumn("__fj_bk", substring(lower(col("q")), 1, blockChars))
    val c0 = catalog.select(col(cCol).as("__fj_cand"))
      .where(col("__fj_cand").isNotNull).distinct()
      .withColumn("__fj_bk", substring(lower(col("__fj_cand")), 1, blockChars))
    val flooded = c0.groupBy("__fj_bk").agg(count(lit(1)).as("__fj_n"))
      .where(col("__fj_n") > maxBlock)
      .select(col("__fj_bk").as("__fj_fb"))
    val c = c0.join(broadcast(flooded), col("__fj_bk") === col("__fj_fb"), "left_anti")
    val scored = p.join(c, Seq("__fj_bk"))
      .withColumn("score",
        lit(1.0) - levenshtein(lower(col("q")), lower(col("__fj_cand"))).cast("double") /
          greatest(length(col("q")), length(col("__fj_cand"))).cast("double"))
    val w = Window.partitionBy("q").orderBy(col("score").desc, col("__fj_cand"))
    scored.withColumn("__fj_rnk", row_number().over(w))
      .where(col("__fj_rnk") === 1 && col("score") >= threshold)
      .select(col("q"), col("__fj_cand").as("resolved"), col("score"))
  }
}
