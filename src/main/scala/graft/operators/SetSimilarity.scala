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
  *   4. the candidate join is ASYMMETRIC (WWW'08 §4): the size-smaller
  *      side of each pair contributes only its INDEXING prefix
  *      (`n - ceil(2t/(1+t)·n) + 1` tokens) while the larger side probes
  *      with its full prefix (`n - ceil(t·n) + 1`) — at t=0.5 that is
  *      ~n/3 × ~n/2 work per hot shingle instead of (n/2)²; the length
  *      filter `na >= ceil(t·nb)` runs inside the join and a hot shingle
  *      is an AQE skew-split, not a correctness hazard;
  *   5. the POSITIONAL filter (WWW'08 §3.2): every matched prefix token
  *      at ranks (ra, rb) proves `overlap <= least(ra,rb) - 1 + 1 +
  *      least(na-ra, nb-rb)` (common tokens before it are capped by the
  *      smaller prefix position, after it by the smaller remaining
  *      suffix); a pair survives only if the MIN of that bound over its
  *      matched tokens reaches the equivalent-overlap requirement
  *      `alpha = ceil(t/(1+t)·(na+nb))` — this replaces the old
  *      `distinct()` with an equally-shuffled but far stronger
  *      groupBy+min gate;
  *   6. a HASHED screen resolves the surviving candidates against per-doc
  *      xxhash64-shingle arrays first (long-array intersection, ~10x
  *      cheaper per row than string arrays — published PPJoin
  *      implementations verify on integer token ids for the same reason).
  *      The screen is provably lossless: when the hash is injective on
  *      each doc's shingle set — checked EXACTLY per doc by comparing
  *      |distinct hashes| to |distinct shingles| — hashing can only merge
  *      tokens ACROSS the two sets, so `|h(A)∩h(B)| >= |A∩B|` and
  *      `|h(A)∪h(B)| <= |A∪B|`, i.e. hashed Jaccard >= true Jaccard and
  *      no true pair is screened out; the vanishingly-rare doc that does
  *      collide in-set routes its pairs straight to exact verification;
  *   7. exact verification joins the screen's survivors (within a whisker
  *      of the true result set) back to per-doc sorted shingle arrays and
  *      computes exact Jaccard in-row — integer ratio, engine-exact.
  *
  * All ceil() bounds are relaxed by 1e-9 before rounding: double
  * arithmetic may land an exact rational epsilon ABOVE the true integer
  * boundary, and an over-tight bound would drop a true pair. Relaxing
  * only ever admits extra candidates, and verification is exact.
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
    val eps = 1e-9

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

    // Probing prefix (the full prefix-filter lemma): first
    // n - ceil(t*n) + 1 tokens. The indexing prefix is its subset:
    // first n - ceil(2t/(1+t)*n) + 1 tokens (2t/(1+t) >= t on (0,1]).
    val probe = ranked
      .where(col("__r") <=
        col("__n") - ceil(lit(threshold) * col("__n") - lit(eps)) + 1)
      .select(col("__t"), col("id"), col("__n"), col("__r"))
    val indexFrac = 2.0 * threshold / (1.0 + threshold)
    val index = probe
      .where(col("__r") <=
        col("__n") - ceil(lit(indexFrac) * col("__n") - lit(eps)) + 1)

    // Pair order is (n, id) ascending — the smaller set is always the
    // indexed side, mirroring PPJoin's size-ascending stream.
    val a = index.select(col("__t"), col("id").as("ia"),
      col("__n").as("na"), col("__r").as("ra"))
    val b = probe.select(col("__t"), col("id").as("ib"),
      col("__n").as("nb"), col("__r").as("rb"))
    val alpha = ceil(
      lit(threshold / (1.0 + threshold)) * (col("na") + col("nb")) - lit(eps))
    val cand = a.join(b, Seq("__t"))
      .where(col("na") < col("nb") ||
        (col("na") === col("nb") && col("ia") < col("ib")))
      .where(col("na") >= ceil(lit(threshold) * col("nb") - lit(eps)))
      .withColumn("__ub",
        least(col("ra"), col("rb")) +
          least(col("na") - col("ra"), col("nb") - col("rb")))
      .groupBy("ia", "ib", "na", "nb")
      .agg(min(col("__ub")).as("__mub"))
      .where(col("__mub") >= alpha)
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"))

    // Hashed screen (scaladoc step 6). `__inj` is the exact per-doc
    // injectivity witness; a non-injective doc (a 64-bit in-set collision)
    // makes its pairs bypass the screen rather than risk a false negative.
    val hsets = docs.select(col(idCol).as("id"),
      array_distinct(S.tokenShingles(col(textCol), shingleSize)).as("__sh"))
      .select(col("id"), size(col("__sh")).as("__nsh"),
        array_distinct(transform(col("__sh"), t => xxhash64(t))).as("__h"))
      .select(col("id"), col("__h"),
        (size(col("__h")) === col("__nsh")).as("__inj"))
    val screened = cand
      .join(hsets.select(col("id").as("id_a"), col("__h").as("__ha"),
        col("__inj").as("__ja")), "id_a")
      .join(hsets.select(col("id").as("id_b"), col("__h").as("__hb"),
        col("__inj").as("__jb")), "id_b")
      .where(!col("__ja") || !col("__jb") ||
        size(array_intersect(col("__ha"), col("__hb"))) >=
          lit(threshold) * size(array_union(col("__ha"), col("__hb"))) - lit(eps))
      .select("id_a", "id_b")

    Dedup.verifyJaccard(docs, screened, idCol, textCol, shingleSize)
      .where(col("jaccard") >= threshold)
  }
}
