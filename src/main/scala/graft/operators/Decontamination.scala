package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the train/test overlap check every serious
  * training-data pipeline runs before shipping a corpus: flag corpus
  * documents sharing at least `minOverlapFrac` of a test item's distinct
  * word n-grams (the standard n-gram contamination definition used for
  * eval-set leakage).
  *
  * 100 TB posture (the BM25 vocabulary-prune pattern): the test set is
  * small by construction, so its n-grams broadcast; the corpus n-gram
  * stream is generated shuffle-free (explode of an in-place projection,
  * the q49 chunking idiom) and semi-joined against the broadcast test
  * vocabulary BEFORE anything shuffles — only the tiny matching fraction
  * ever moves. The one shuffle is the per-(doc, test) match count over
  * that pruned stream. No corpus self-join, no full-corpus distinct.
  */
object Decontamination {

  /** (doc_id, test_id, matched, test_total, overlap_frac) for every pair
    * at or above `minOverlapFrac`, where `matched` counts DISTINCT shared
    * n-grams and `test_total` the test item's distinct n-grams. Documents
    * shorter than `n` tokens have no n-grams and cannot be flagged. */
  def contaminationReport(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      testSet: DataFrame,
      testIdCol: String,
      testTextCol: String,
      n: Int = 3,
      minOverlapFrac: Double = 0.5): DataFrame = {
    require(n >= 1 && minOverlapFrac > 0.0, "need n >= 1 and a positive threshold")

    def grams(df: DataFrame, id: Column, text: Column, outId: String): DataFrame = {
      val toks = split(trim(lower(text)), "\\s+")
      df.select(id.as(outId), toks.as("__t"))
        .filter(size(col("__t")) >= n)
        .select(col(outId),
          explode(sequence(lit(1), size(col("__t")) - (n - 1))).as("__p"), col("__t"))
        .select(col(outId),
          array_join(slice(col("__t"), col("__p"), lit(n)), " ").as("ngram"))
    }

    val tg = grams(testSet, col(testIdCol), col(testTextCol), "test_id").distinct()
    val totals = tg.groupBy("test_id").agg(count(lit(1)).as("test_total"))
    val vocab = tg.select("ngram").distinct()

    grams(docs, col(idCol), col(textCol), "doc_id")
      .join(broadcast(vocab), Seq("ngram"), "left_semi") // prune before any shuffle
      .distinct()                                        // distinct (doc, ngram), pruned grain
      .join(broadcast(tg), "ngram")
      .groupBy("doc_id", "test_id")
      .agg(count(lit(1)).as("matched"))
      .join(broadcast(totals), "test_id")
      .withColumn("overlap_frac", col("matched").cast("double") / col("test_total"))
      .filter(col("overlap_frac") >= minOverlapFrac)
      .select("doc_id", "test_id", "matched", "test_total", "overlap_frac")
  }

  /** Semantic (embedding-space) contamination screen — the companion to the
    * n-gram check above for paraphrased eval leakage: flag corpus vectors
    * whose cosine to ANY test-set vector reaches `thrNum/thrDen` (θ² as an
    * exact rational, e.g. 529/625 = 0.92²).
    *
    * The whole predicate runs in EXACT integer arithmetic on int8-quantized
    * vectors ([[Similarity.quantizeInt8]] — cosine is scale-invariant, so
    * quantized cosine IS the screen's definition, not an approximation of
    * it): with integer dot products d = ⟨qa,qb⟩, na = ⟨qa,qa⟩, nb = ⟨qb,qb⟩,
    *   cos ≥ θ  ⇔  d > 0 ∧ d²·thrDen ≥ thrNum·na·nb
    * — longs throughout (int8 dims ≤ 64 keep d ≤ 127²·64 ≈ 1.0e6, d²·625
    * ≈ 6.7e14 < 2⁶³), no sqrt, no doubles, so any engine replays the flag
    * set bit-for-bit. Threshold choice vs float cosine: θ must be given in
    * the quantized domain (the ~0.3% int8 rounding shifts borderline pairs
    * — that is part of the operator's definition, exactly as MinHash
    * banding is the definition of the q18 screen).
    *
    * Scale shape: the test set is small by construction → broadcast; the
    * corpus side is a projection (quantize) + broadcast nested-loop filter;
    * only FLAGGED pairs reach the one corpus-id shuffle. No corpus
    * self-join; the corpus is never exchanged.
    *
    * Returns (idCol, n_test_matches, first_test_id) per flagged corpus
    * vector — first_test_id = min matching test id (deterministic without
    * cross-pair score comparison, which integer dots do not totally order).
    */
  def semanticContamination(
      corpus: DataFrame,
      testSet: DataFrame,
      idCol: String,
      vecCol: String,
      thrNum: Long,
      thrDen: Long): DataFrame = {
    require(thrNum >= 0 && thrDen > 0, "threshold must be a nonneg rational")
    def q(df: DataFrame, out: String) =
      Similarity.quantizeInt8(df, idCol, vecCol)
        .select(col(idCol).as(out),
          transform(col("qvec"), x => x.cast("long")).as(s"__q_$out"))
    // native codegen dot (graft_dot_long): the HOF formulation
    // (aggregate(zip_with)) is a CodegenFallback and dominated this
    // screen's broadcast-nested-loop hot path; vanilla-session fallback
    // mirrors PortableHash.md5Hash60's posture
    def dot(a: Column, b: Column): Column =
      org.apache.spark.sql.SparkSession.getActiveSession match {
        case Some(sp) => graft.plans.GraftExtensions.dotLong(sp, a, b)
        case None =>
          aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
      }
    def norm2(a: Column): Column = dot(a, a)

    val t = broadcast(q(testSet, "test_id")
      .withColumn("__nb", norm2(col("__q_test_id"))))
    val c = q(corpus, "corpus_id")
      .withColumn("__na", norm2(col("__q_corpus_id")))

    // materialize the dot ONCE per pair before the predicate — the HOF
    // fold is interpreted (no whole-stage codegen), so referencing `d`
    // three times inside the join condition would triple the array work
    c.crossJoin(t)
      .withColumn("__d", dot(col("__q_corpus_id"), col("__q_test_id")))
      .filter(col("__d") > 0L &&
        col("__d") * col("__d") * lit(thrDen) >=
          lit(thrNum) * col("__na") * col("__nb"))
      .groupBy(col("corpus_id"))
      .agg(count(lit(1)).as("n_test_matches"),
        min(col("test_id")).as("first_test_id"))
      .select(col("corpus_id").as(idCol), col("n_test_matches"),
        col("first_test_id"))
  }
}
