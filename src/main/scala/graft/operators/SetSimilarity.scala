package graft.operators

import graft.functions.{SimilarityFunctions => S}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering (the SSJoin /
  * PPJoin family — Chaudhuri, Ganti & Kaushik ICDE'06; Xiao, Wang, Lin &
  * Yu WWW'08 — both published algorithms).
  *
  * Unlike the MinHash-LSH path ([[Dedup.minhashPairs]]) this join is
  * EXACT: it returns precisely the pairs with Jaccard >= threshold, no
  * probabilistic recall. The price is a candidate stage whose size is
  * governed by the prefix-filter lemma rather than band collisions:
  *
  *   Order the universe of tokens by ascending document frequency (ties
  *   by token). If J(A,B) >= t then A and B share at least one token
  *   among the first |X| - ceil(t * |X|) + 1 tokens of EACH set in that
  *   global order (the "prefix"). Rare-first ordering makes prefixes
  *   collide rarely, so the candidate join touches a small fraction of
  *   the token stream while staying complete.
  *
  * Scale shape (the whole point vs a brute-force token self-join):
  *   1. distinct `(id, shingle)` grain — one map-side-combined shuffle;
  *   2. df per shingle — one map-side-combined shuffle on the shingle;
  *   3. the per-doc rank window partitions by the DOC id (bounded by a
  *      single document's shingle count, never corpus-wide);
  *   4. the candidate self-join runs on PREFIX tokens only, with the
  *      length filter `min(n) >= ceil(t * max(n))` applied inside the
  *      join; a hot shingle is an AQE skew-split, not a correctness
  *      hazard;
  *   5. verification joins the deduped candidate pairs back to per-doc
  *      sorted shingle arrays (bounded per row) and computes exact
  *      Jaccard in-row — integer ratio, engine-exact.
  *
  * Returns `(id_a, id_b, jaccard)` with `id_a < id_b`, only pairs at or
  * above `threshold`.
  */
object SetSimilarity {

  def selfJoin(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleSize: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(!docs.columns.exists(Set("__t", "__df", "__r", "__n")),
      "docs must not contain reserved internal columns __t/__df/__r/__n")

    val toks = docs.select(col(idCol).as("id"),
      explode(array_distinct(S.tokenShingles(col(textCol), shingleSize)))
        .as("__t"))

    val sizes = toks.groupBy("id").agg(count(lit(1)).as("__n"))
    val dfs = toks.groupBy("__t").agg(count(lit(1)).as("__df"))

    // Global rare-first order (df asc, token asc); the rank window is
    // per-document, so its partition is bounded by one doc's shingles.
    val ranked = toks
      .join(dfs, "__t")
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("__df"), col("__t"))))
      .join(sizes, "id")

    // Prefix-filter lemma: keep the first n - ceil(t*n) + 1 tokens.
    val prefix = ranked
      .where(col("__r") <= col("__n") - ceil(lit(threshold) * col("__n")) + 1)
      .select(col("__t"), col("id"), col("__n"))

    val cand = prefix.toDF("__t", "id_a", "na")
      .join(prefix.toDF("__t", "id_b", "nb"), Seq("__t"))
      .where(col("id_a") < col("id_b") &&
        least(col("na"), col("nb")) >=
          ceil(lit(threshold) * greatest(col("na"), col("nb"))))
      .select("id_a", "id_b")
      .distinct()

    Dedup.verifyJaccard(docs, cand, idCol, textCol, shingleSize)
      .where(col("jaccard") >= threshold)
  }
}
