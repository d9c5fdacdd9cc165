package graft.operators

import graft.functions.{SimilarityFunctions => S}
import graft.plans.GraftExtensions
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
  * THE TOKEN UNIVERSE IS HASHED: every published PPJoin implementation
  * dictionary-encodes tokens to integers before joining; distributed, a
  * global dictionary is an extra corpus sort, so the encoding here is
  * 32-bit murmur3 of the shingle. That is sound end-to-end because
  * (a) hashing that is INJECTIVE ON EACH DOC's shingle set can only merge
  * tokens ACROSS two sets, so `|h(A)∩h(B)| >= |A∩B|` and
  * `|h(A)∪h(B)| <= |A∪B|` — hashed Jaccard >= true Jaccard and the
  * candidate set in hash space is a superset of the true pair set;
  * (b) per-doc injectivity is WITNESSED EXACTLY (|distinct hashes| ==
  * |distinct shingles|), and the vanishingly-rare colliding doc falls
  * back to brute-force pairing against every size-compatible doc (exact,
  * and bounded by the number of such docs — in practice zero);
  * (c) final verification recomputes Jaccard on the true shingle STRINGS,
  * so hash conflation can only cost screen work, never a wrong answer.
  *
  * Scale shape (the whole point vs a brute-force token self-join):
  *   1. one shingle pass builds the per-doc sorted int-hash array
  *      (localCheckpointed: ~8B/shingle, reused by the token stream, the
  *      screen and the fallback — the corpus text is shingled ONCE);
  *   2. df per token — one map-side-combined shuffle on an INT key;
  *   3. the per-doc rank window partitions by the DOC id (bounded by a
  *      single document's shingle count, never corpus-wide);
  *   4. the candidate join is ASYMMETRIC (WWW'08 §4): the size-smaller
  *      side of each pair contributes only its INDEXING prefix
  *      (`n - ceil(2t/(1+t)·n) + 1` tokens) while the larger side probes
  *      with its full prefix (`n - ceil(t·n) + 1`) — at t=0.5 that is
  *      ~n/3 × ~n/2 work per hot token instead of (n/2)²; the length
  *      filter `na >= ceil(t·nb)` runs inside the join and a hot token
  *      is an AQE skew-split, not a correctness hazard;
  *   5. the POSITIONAL filter (WWW'08 §3.2): a matched prefix token at
  *      ranks (ra, rb) proves `overlap <= least(ra,rb) +
  *      least(na-ra, nb-rb)`; rows whose bound misses the
  *      equivalent-overlap requirement `alpha = ceil(t/(1+t)·(na+nb))`
  *      drop in-line. The filter is deliberately row-level (a pair lives
  *      if ANY of its matched tokens passes — sound, since a true pair's
  *      genuine matches all pass) and candidate pairs stay
  *      UN-deduplicated until after the screen: a pair-grain groupBy here
  *      is a full candidate-stream Exchange that measured out at ~4% row
  *      reduction;
  *   6. the screen joins the per-doc sorted hash arrays onto the
  *      candidate stream (SHUFFLE_HASH-hinted — sorting tens of millions
  *      of array-carrying rows for a sort-merge join is pure waste) and
  *      bounds Jaccard with the codegen'd two-pointer
  *      [[graft.plans.SortedIntersectCount]]: `|∩|·(1+t) >= t·(na+nb)`
  *      decides `J_hash >= t` with |∪| as arithmetic, no union array,
  *      no per-row hash set;
  *   7. exact verification joins the screen's survivors (within a whisker
  *      of the true result set) back to per-doc shingle STRING arrays and
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
    val spark = docs.sparkSession
    val eps = 1e-9

    // One shingle pass for the whole operator (scaladoc step 1).
    val hsets = docs.select(col(idCol).as("id"),
      array_distinct(S.tokenShingles(col(textCol), shingleSize)).as("__sh"))
      .select(col("id"), size(col("__sh")).as("__nsh"),
        array_sort(array_distinct(transform(col("__sh"), t => hash(t))))
          .as("__h"))
      .select(col("id"), col("__h"),
        (size(col("__h")) === col("__nsh")).as("__inj"))
      .localCheckpoint()

    val good = hsets.where(col("__inj"))
    val toks = good.select(col("id"), size(col("__h")).as("__n"),
      explode(col("__h")).as("__t"))
    val dfs = toks.groupBy("__t").agg(count(lit(1)).as("__df"))

    // Global rare-first order (df asc, token asc); the rank window is
    // per-document, so its partition is bounded by one doc's shingles.
    val ranked = toks
      .join(dfs, "__t")
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("__df"), col("__t"))))

    // Probing prefix (the full prefix-filter lemma): first
    // n - ceil(t*n) + 1 tokens. The indexing prefix is its subset:
    // first n - ceil(2t/(1+t)*n) + 1 tokens (2t/(1+t) >= t on (0, 1]).
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
      .where(least(col("ra"), col("rb")) +
        least(col("na") - col("ra"), col("nb") - col("rb")) >= alpha)
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"))

    // Hashed screen (scaladoc step 6): all candidate ids are injective
    // docs by construction, so J_hash >= J_true holds unconditionally.
    val screened = cand
      .join(hsets.select(col("id").as("id_a"), col("__h").as("__ha"))
        .hint("SHUFFLE_HASH"), "id_a")
      .join(hsets.select(col("id").as("id_b"), col("__h").as("__hb"))
        .hint("SHUFFLE_HASH"), "id_b")
      .where(GraftExtensions.sortedIntersect(spark, col("__ha"), col("__hb"))
        .cast("double") * (1.0 + threshold) >=
        lit(threshold) * (size(col("__ha")) + size(col("__hb"))) - lit(eps))
      .select("id_a", "id_b")
      .distinct()

    // Exact fallback for non-injective docs (scaladoc contract (b)):
    // brute-force pair each against every doc. Provably rare — the
    // injectivity witness fails only on an in-set 32-bit collision
    // (~n²/2³³ per doc) — so the crossJoin side is ~0 rows.
    val bad = hsets.where(!col("__inj")).select(col("id").as("__bid"))
    val fallback = bad
      .crossJoin(hsets.select(col("id").as("__oid")))
      .where(col("__bid") =!= col("__oid"))
      .select(least(col("__bid"), col("__oid")).as("id_a"),
        greatest(col("__bid"), col("__oid")).as("id_b"))

    Dedup.verifyJaccard(docs, screened.unionByName(fallback).distinct(),
      idCol, textCol, shingleSize)
      .where(col("jaccard") >= threshold)
  }

  /** Exact set-CONTAINMENT self-join: pairs where the smaller set is
    * mostly inside the larger — `C(A,B) = |A∩B| / |A| >= t` with
    * `|A| <= |B|`. This is the asymmetric near-dup a Jaccard join
    * structurally misses: a 50-shingle quote embedded verbatim in a
    * 500-shingle article has containment 1.0 but Jaccard ~0.1, and
    * training-data dedup wants exactly that subsumption case (the
    * quote-chain/syndication pattern; same motivation as the reference's
    * URL-prefix dedupe in `articles_ingest.py` — subsumed variants of one
    * canonical item).
    *
    * Prefix filtering adapts (Melnik/Garcia-Molina-style containment
    * variants of the ICDE'06 lemma): the contained side A must hit within
    * its first `na - ceil(t·na) + 1` rare-first tokens (miss them all and
    * overlap <= na - that < ceil(t·na)); the containing side B has no
    * Jaccard-style length bound — ANY large set can contain A — so its
    * probe prefix is bounded by the operator-level floor `minSetSize <=
    * na`: overlap >= ceil(t·minSetSize) always, hence B hits within its
    * first `nb - ceil(t·minSetSize) + 1` tokens. That floor is the knob
    * that keeps the probe side sub-linear (without it the containing side
    * must stream every token, the classic containment-join cost); it is
    * an explicit semantic parameter — sets smaller than `minSetSize`
    * never report as contained — not a silent cap.
    *
    * The shared positional bound `least(ra,rb) + least(na-ra, nb-rb)`
    * prunes against `alpha = ceil(t·na)`; the hashed sorted-intersect
    * screen and the per-doc injectivity witness + brute-force fallback
    * carry over unchanged from [[selfJoin]] (hashed overlap >= true
    * overlap, so both stages only over-admit; final verification is exact
    * integer arithmetic on the true shingle strings).
    *
    * Returns `(id_a, id_b, containment)` — id_a the contained (smaller)
    * set, ties oriented by id — for pairs at or above `threshold`.
    */
  def containmentJoin(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      minSetSize: Int = 10,
      shingleSize: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(minSetSize >= 1, "minSetSize must be >= 1")
    require(!docs.columns.exists(Set("__t", "__df", "__r", "__n")),
      "docs must not contain reserved internal columns __t/__df/__r/__n")
    val spark = docs.sparkSession
    val eps = 1e-9

    val hsets = docs.select(col(idCol).as("id"),
      array_distinct(S.tokenShingles(col(textCol), shingleSize)).as("__sh"))
      .select(col("id"), size(col("__sh")).as("__nsh"),
        array_sort(array_distinct(transform(col("__sh"), t => hash(t))))
          .as("__h"))
      .select(col("id"), col("__h"),
        (size(col("__h")) === col("__nsh")).as("__inj"))
      .localCheckpoint()

    val good = hsets.where(col("__inj"))
    val toks = good.select(col("id"), size(col("__h")).as("__n"),
      explode(col("__h")).as("__t"))
    val dfs = toks.groupBy("__t").agg(count(lit(1)).as("__df"))
    val ranked = toks
      .join(dfs, "__t")
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("__df"), col("__t"))))

    // contained-side prefix: rarest na - ceil(t*na) + 1 tokens, only
    // sets large enough to qualify as contained
    val a = ranked
      .where(col("__n") >= minSetSize)
      .where(col("__r") <=
        col("__n") - ceil(lit(threshold) * col("__n") - lit(eps)) + 1)
      .select(col("__t"), col("id").as("ia"),
        col("__n").as("na"), col("__r").as("ra"))
    // containing-side prefix: overlap >= ceil(t*minSetSize) univerally,
    // so the first nb - ceil(t*minSetSize) + 1 tokens must witness it
    val probeSlack = math.ceil(threshold * minSetSize - eps).toLong
    val b = ranked
      .where(col("__r") <= col("__n") - lit(probeSlack) + 1)
      .select(col("__t"), col("id").as("ib"),
        col("__n").as("nb"), col("__r").as("rb"))

    val alpha = ceil(lit(threshold) * col("na") - lit(eps))
    val cand = a.join(b, Seq("__t"))
      .where(col("na") < col("nb") ||
        (col("na") === col("nb") && col("ia") < col("ib")))
      .where(least(col("ra"), col("rb")) +
        least(col("na") - col("ra"), col("nb") - col("rb")) >= alpha)
      .select(col("ia").as("id_a"), col("ib").as("id_b"))

    val screened = cand
      .join(hsets.select(col("id").as("id_a"), col("__h").as("__ha"))
        .hint("SHUFFLE_HASH"), "id_a")
      .join(hsets.select(col("id").as("id_b"), col("__h").as("__hb"))
        .hint("SHUFFLE_HASH"), "id_b")
      .where(GraftExtensions.sortedIntersect(spark, col("__ha"), col("__hb"))
        .cast("double") >= lit(threshold) * size(col("__ha")) - lit(eps))
      .select("id_a", "id_b")
      .distinct()

    // non-injective fallback: both orientations, exact verify orients
    val bad = hsets.where(!col("__inj")).select(col("id").as("__bid"))
    val fallback = bad
      .crossJoin(hsets.select(col("id").as("__oid")))
      .where(col("__bid") =!= col("__oid"))
      .select(col("__bid").as("id_a"), col("__oid").as("id_b"))

    val sets = docs.select(col(idCol).as("id"),
      array_distinct(S.tokenShingles(col(textCol), shingleSize)).as("sh"))
    screened.unionByName(fallback).distinct()
      .join(sets.select(col("id").as("id_a"), col("sh").as("__sa")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("__sb")), "id_b")
      .withColumn("__na", size(col("__sa")))
      .withColumn("__nb", size(col("__sb")))
      .where(col("__na") < col("__nb") ||
        (col("__na") === col("__nb") && col("id_a") < col("id_b")))
      .where(col("__na") >= minSetSize)
      .withColumn("containment",
        size(array_intersect(col("__sa"), col("__sb"))).cast("double") /
          col("__na"))
      .where(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }
}
