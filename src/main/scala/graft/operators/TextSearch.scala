package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational BM25 keyword search over a document corpus — the ranking
  * stage of a training-data / retrieval pipeline, as pure DataFrame ops.
  *
  * Scoring (Lucene's BM25 variant, always-positive idf):
  * {{{
  *   idf(t)      = ln((N - df + 0.5) / (df + 0.5) + 1)
  *   score(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
  * }}}
  *
  * Plan shape (100 TB posture):
  *  - doc length rides the tokenization projection (`size(tk)` next to
  *    `explode(tk)`), so no corpus-wide join on doc id exists anywhere;
  *  - tokens are filtered to the query vocabulary BEFORE the tf aggregate —
  *    the only corpus shuffle is (doc, query-term) rows, a tiny fraction of
  *    the token stream;
  *  - query terms and per-term document frequencies broadcast;
  *  - per-(query, doc) scores sum through DecimalType(38,12): deterministic
  *    under partial-aggregation order (double addition is non-associative),
  *    which keeps ranks reproducible run-to-run and engine-to-engine — the
  *    repo-wide decimal-sum policy;
  *  - top-k per query is a bounded rank window over the scored rows.
  *
  * Returns (query_id, rank, doc_id) with rank 1..k by (score desc, doc id).
  */
object TextSearch {

  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(Int, Seq[String])],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "need queries")
    val spark = docs.sparkSession
    import spark.implicits._
    val allTerms = queries.flatMap(_._2).distinct
    val qterms = queries
      .flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
      .toDF("query_id", "term")
    // interactive mode: the vocabulary is small enough to plan as isin
    // literals (predicate pushes into the token projection, no join)
    bm25Core(docs, idCol, textCol, qterms, k, k1, b,
      vocabPrune = _.filter(col("term").isin(allTerms: _*)))
  }

  /** BM25 over an unbounded query SET (a 10k-query evaluation sweep): the
    * queries arrive as a DataFrame `(query_id, term)` — one row per query
    * term — and vocabulary pruning becomes a broadcast LEFT SEMI join
    * against the distinct query vocabulary instead of an `isin` literal
    * list (which would plan a multi-thousand-element predicate). Scoring
    * joins stay broadcast on the query side; the corpus still shuffles
    * only its query-vocabulary token subset. */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: DataFrame,
      k: Int,
      k1: Double,
      b: Double): DataFrame = {
    val qterms = queryTerms.select(col("query_id"), col("term")).distinct()
    val vocab = broadcast(qterms.select("term").distinct())
    bm25Core(docs, idCol, textCol, qterms, k, k1, b,
      vocabPrune = _.join(vocab, Seq("term"), "left_semi"))
  }

  /** DataFrame-queries overload with default BM25 parameters. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: DataFrame, k: Int): DataFrame =
    bm25TopK(docs, idCol, textCol, queryTerms, k, 1.2, 0.75)

  private def bm25Core(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      qterms: DataFrame,
      k: Int,
      k1: Double,
      b: Double,
      vocabPrune: DataFrame => DataFrame): DataFrame = {
    require(k > 0, "need k > 0")
    def tokens(c: Column): Column = split(trim(lower(c)), "\\s+")
    val base = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("tk"))
      .select(col("id"), size(col("tk")).cast("double").as("dl"),
        explode(col("tk")).as("term"))
    // (doc, term, tf, dl) for query terms only; persisted because both the
    // df aggregate and the scoring join read it. Routed through
    // Caching.track so long-lived sessions don't accumulate an entry per
    // distinct (docs, queries) plan — Spark's CacheManager never drops
    // entries on its own; the registry FIFO-bounds them.
    val tfq = graft.Caching.track(vocabPrune(base)
      .groupBy("id", "term")
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl")))
    val dfc = tfq.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val stats = docs.select(size(tokens(col(textCol))).cast("double").as("dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl"))

    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val termScore = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    val scored = tfq
      .join(broadcast(qterms), "term")
      .join(broadcast(dfc), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("id"),
        termScore.cast("decimal(38,12)").as("__s"))
      .groupBy("query_id", "id")
      .agg(sum(col("__s")).as("score"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("doc_id"))
  }

  /** Tokenizer-prep vocabulary builder: term counts over the corpus,
    * a `minCount` floor, and deterministic ids by (count desc, term).
    *
    * Scale shape: ONE map-side-combined shuffle on the term (the token
    * stream never moves raw — partial counts do); the global ranking is
    * applied only AFTER the vocabulary is bounded to `maxVocab` by a
    * TakeOrderedAndProject top-k (per-partition bounded heaps), so the
    * unpartitioned id window sees at most `maxVocab` rows — the q12
    * pagination pattern, never a corpus-wide global sort. */
  def buildVocab(
      docs: DataFrame,
      textCol: String,
      minCount: Long,
      maxVocab: Int): DataFrame = {
    val counts = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("term"))
      .limit(maxVocab)
    // bounded domain (<= maxVocab rows after the limit above): the
    // constant partition key states the intentional single partition
    counts.withColumn("vocab_id", row_number().over(
      Window.partitionBy(lit(0)).orderBy(col("n").desc, col("term"))).cast("long"))
  }

  /** Tokenizer APPLY step: encode each document against a `(term,
    * vocab_id)` vocabulary ([[buildVocab]]'s output) — order-preserving
    * token→id mapping with OOV→0. Returns `(id, n_tokens, n_oov,
    * ids_csv)`; ids ride as a CSV string so the result is byte-comparable
    * across engines (parquet list columns stringify differently per
    * reader).
    *
    * Scale shape: the vocabulary is bounded (maxVocab) → broadcast join;
    * one shuffle to reassemble per-doc sequences. The collect_list is
    * bounded by document length — inherent to the op (a doc's ids must
    * coexist in one row) — and order is restored by an in-row array_sort
    * on (pos, id) structs, NOT a sort of the exploded stream. */
  def encodeWithVocab(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      posexplode(split(trim(lower(col(textCol))), "\\s+")).as(Seq("pos", "term")))
    toks
      .join(broadcast(vocab.select(col("term"), col("vocab_id"))), Seq("term"), "left")
      .withColumn("vid", coalesce(col("vocab_id"), lit(0L)))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("vid") === 0L, 1L).otherwise(0L)).as("n_oov"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("vid")))),
            s => s.getField("vid").cast("string")),
          ",").as("ids_csv"))
  }

  /** Per-document keyword extraction: top-`k` terms by tf/df — term
    * frequency over document frequency, the rank-equivalent core of
    * tf-idf for a fixed corpus (idf is monotone-decreasing in df), chosen
    * over log-idf because tf/df is ONE exact integer-ratio double
    * division, bit-identical across engines (the repo's float policy;
    * ln() is the classic 1-ulp parity hazard). Ties break (score desc,
    * term asc). Returns `(id, rank, term, tf, df, score)`.
    *
    * Scale shape: one map-side-combined shuffle to the `(doc, term)`
    * grain, df via ONE window on the term (no vocabulary self-join), and
    * the per-doc top-k rank window is WindowGroupLimit-bounded (the q64
    * pattern) — every stage is linear in the token stream. */
  def keywordsTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .withColumn("score", col("tf").cast("double") / col("df"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("id")
          .orderBy(col("score").desc, col("term").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
  }

  /** CCNet-style vocabulary-coverage score (Wenzek et al. 2020 use a
    * reference-corpus LM; the unigram-coverage reduction keeps the exact
    * arithmetic this repo's oracle policy wants): for each document, the
    * fraction of its tokens found in a reference vocabulary (e.g.
    * [[buildVocab]] over a trusted high-quality slice). Low coverage ≈
    * out-of-domain / junk — the pretraining gate companion to
    * `Quality.gopherRules`.
    *
    * Scale shape: the vocabulary is bounded (maxVocab) → broadcast hash
    * join against the exploded token stream; ONE map-side-combined
    * shuffle on the doc id carries only (count, hit-count) partials.
    * `coverage` is a single exact-int / exact-int double division.
    */
  def vocabCoverage(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame): DataFrame = {
    require(!docs.columns.exists(_.startsWith("__")),
      "input __ columns are reserved by vocabCoverage")
    val toks = docs.select(col(idCol),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
    toks
      .join(broadcast(vocab.select(col("term"), lit(1L).as("__in"))),
        Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__in"), lit(0L))).as("in_vocab"))
      .withColumn("coverage",
        col("in_vocab").cast("double") / col("n_tokens"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher SIGIR'09) — the
    * standard hybrid-retrieval combiner: given two per-query rank lists
    * (e.g. BM25 keyword top-k and embedding-cosine top-k),
    * `score(d) = Σ_lists 1/(k0 + rank_list(d))`, re-ranked. Rank-only
    * fusion is what makes it robust (no score calibration between
    * retrievers) AND engine-exact (1/(k0+r) is one correctly-rounded IEEE
    * division; the two-term sum has a fixed operand order).
    *
    * Inputs are `(query_id, doc_id, rank)` frames — top-k lists, so
    * query-grain-bounded (≤ k rows per query per retriever, NOT corpus
    * grain). The full-outer join and the re-rank window both run at that
    * bounded grain; at 100 TB the heavy work lives in the upstream
    * retrievers, never here.
    *
    * Returns `(query_id, rank, doc_id, rrf_score)`, top `k` per query by
    * (score desc, doc_id). */
  def rrfFuse(a: DataFrame, b: DataFrame, k0: Int = 60, k: Int = 10): DataFrame = {
    val fa = a.select(col("query_id"), col("doc_id"),
      (lit(1.0) / (lit(k0) + col("rank"))).as("__sa"))
    val fb = b.select(col("query_id"), col("doc_id"),
      (lit(1.0) / (lit(k0) + col("rank"))).as("__sb"))
    fa.join(fb, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(col("__sa"), lit(0.0)) + coalesce(col("__sb"), lit(0.0)))
          .as("rrf_score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("rrf_score").desc, col("doc_id"))).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "rrf_score")
  }

  /** Bigram collocation mining by LIFT — phrase discovery for vocabulary /
    * tokenizer construction (the association measure behind PMI-based
    * phrase mining, e.g. Mikolov et al. 2013's word2vec phrase pass, kept
    * log-free: lift = p(x,y) / (p(x)·p(y)), and PMI = ln(lift) is
    * monotone in it, so the ranking is identical while every arithmetic
    * step stays a correctly-rounded IEEE multiply/divide — bit-exact
    * across engines, where ln() is not).
    *
    *   lift(x,y) = (c_xy / M) / ((c_x / N) · (c_y / N))
    *             = (c_xy · N · N) / (M · c_x · c_y)
    *
    * with c_xy the corpus count of the adjacent pair, c_* unigram counts,
    * M total bigrams, N total tokens.
    *
    * Scale shape: adjacent pairs form IN-ROW (`zip_with` of the token
    * array with its own tail — no self-join, no window); the only
    * corpus-grain shuffles are the two map-side-combined count aggregates
    * (bigram-vocabulary and unigram-vocabulary grain). `minCount` prunes
    * the bigram table BEFORE the unigram joins, which then run at
    * filtered-vocabulary grain (broadcast-able; left to AQE). N and M ride
    * 1-row crossJoins (the A8 lazy-scalar idiom). Top-k is
    * TakeOrderedAndProject on (lift desc, x, y) — never a full sort.
    *
    * Returns `(x, y, c_xy, lift)`, the top `k` pairs. */
  def collocationsByLift(
      docs: DataFrame,
      textCol: String,
      minCount: Long = 3L,
      k: Int = 50): DataFrame = {
    require(minCount >= 1 && k >= 1, s"need minCount/k >= 1")
    val arrs = docs.select(lowerTokens(textCol).as("t"))
    val bigrams = arrs
      .filter(size(col("t")) >= 2)
      .select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("x"), b.as("y")))).as("bg"))
      .select(col("bg.x").as("x"), col("bg.y").as("y"))
    liftRank(bigrams, arrs.select(explode(col("t")).as("tok")), minCount, k)
  }

  /** Skip-gram co-occurrence by LIFT (q117's windowed generalization —
    * the word2vec/GloVe co-occurrence statistic): every unordered token
    * pair within `window` positions of each other, ranked by the same
    * log-free PMI. Pair formation is IN-ROW (an indexed transform probes
    * up to `window` positions ahead via `element_at`; pairs normalize to
    * (least, greatest) so orientation never splits a count) — per-row
    * fan-out is `window`-bounded, and the corpus-grain shuffles stay the
    * two count aggregates, exactly the q117 shape. */
  def skipgramByLift(
      docs: DataFrame,
      textCol: String,
      window: Int = 3,
      minCount: Long = 3L,
      k: Int = 50): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(minCount >= 1 && k >= 1, s"need minCount/k >= 1")
    val arrs = docs.select(lowerTokens(textCol).as("t"))
    val pairs = arrs
      .filter(size(col("t")) >= 2)
      .select(explode(flatten(transform(col("t"), (x, i) =>
        transform(
          filter(
            transform(sequence(lit(1), lit(window)),
              // try_element_at: past-the-end probes null out (ANSI
              // element_at throws), then filter drops them
              j => try_element_at(col("t"), (i + j + 1).cast("int"))),
            y => y.isNotNull),
          y => struct(least(x, y).as("x"), greatest(x, y).as("y"))))))
        .as("pg"))
      .select(col("pg.x").as("x"), col("pg.y").as("y"))
    liftRank(pairs, arrs.select(explode(col("t")).as("tok")), minCount, k)
  }

  /** Bigram LM familiarity scoring — the log-free reduction of the
    * CCNet reference-LM quality filter (Wenzek et al. 2020 score documents
    * by KenLM perplexity under a trusted-corpus model; dashboard_app's
    * quality gates are regex/ratio rules — `text_quality.py` family). A
    * bigram "language model" is trained as plain counts over a reference
    * slice (`refFilter`), kept only above `minRefCount`; every document is
    * then scored by how familiar its own bigrams are to that model:
    *
    *  - `coverage`    = matched bigrams / total bigrams — the hard OOV gate;
    *  - `familiarity` = Σ ref-count(matched bigram) / total bigrams — the
    *    perplexity proxy (high = the doc walks well-trodden paths in the
    *    reference corpus; a monotone log-free stand-in for mean log-prob,
    *    chosen so the score is exact-int / exact-int — one IEEE division,
    *    bit-identical in any engine, per the repo oracle policy).
    *
    * Plan shape (100 TB posture): the model table lives at the distinct
    * (x, y) bigram grain — vocabulary-bounded, NOT corpus-bounded — and is
    * explicitly `broadcast` to the corpus-grain bigram stream (for a
    * reference model beyond broadcast size, drop the hint and it degrades
    * to one shuffle join on the bigram key); the per-doc aggregate is ONE
    * map-side-combined shuffle on doc id carrying (count, matched, mass)
    * partials. Long-sums are exact; the two divisions are final-step.
    *
    * Docs with fewer than 2 tokens have no bigrams and are absent from the
    * output (score undefined, matching the oracle's bigram-grain join). */
  def bigramFamiliarity(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      refFilter: Column,
      minRefCount: Long = 2L): DataFrame = {
    require(minRefCount >= 1, "minRefCount must be >= 1")
    val bg = docs
      .select(col(idCol).as("doc_id"), lowerTokens(textCol).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("x"), b.as("y")))).as("bg"))
      .select(col("doc_id"), col("bg.x").as("x"), col("bg.y").as("y"))
    val ref = docs.filter(refFilter)
      .select(col(idCol).as("doc_id"), lowerTokens(textCol).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("x"), b.as("y")))).as("bg"))
      .groupBy(col("bg.x").as("x"), col("bg.y").as("y"))
      .agg(count(lit(1)).as("__rc"))
      .filter(col("__rc") >= minRefCount)
    bg.join(broadcast(ref), Seq("x", "y"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("__rc").isNotNull, 1L).otherwise(0L)).as("n_matched"),
        sum(coalesce(col("__rc"), lit(0L))).as("ref_mass"))
      .withColumn("coverage",
        col("n_matched").cast("double") / col("n_bigrams"))
      .withColumn("familiarity",
        col("ref_mass").cast("double") / col("n_bigrams"))
  }

  private def lowerTokens(textCol: String) =
    split(trim(lower(col(textCol))), "\\s+")

  /** Shared lift ranking over a pair stream: counts, the
    * `c_xy·N·N / (M·c_x·c_y)` IEEE-exact score, deterministic top-k. */
  private def liftRank(
      pairs: DataFrame, unis: DataFrame, minCount: Long, k: Int): DataFrame = {
    val bc = pairs.groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    val uc = unis.groupBy("tok").agg(count(lit(1)).as("c"))
    val n = unis.agg(count(lit(1)).as("__n"))
    val m = pairs.agg(count(lit(1)).as("__m"))
    bc
      .join(uc.select(col("tok").as("x"), col("c").as("__cx")), "x")
      .join(uc.select(col("tok").as("y"), col("c").as("__cy")), "y")
      .crossJoin(n).crossJoin(m)
      .withColumn("lift",
        col("c_xy").cast("double") * col("__n") * col("__n") /
          (col("__m").cast("double") * col("__cx") * col("__cy")))
      .select(col("x"), col("y"), col("c_xy"), col("lift"))
      .orderBy(col("lift").desc, col("x"), col("y"))
      .limit(k)
  }
}
