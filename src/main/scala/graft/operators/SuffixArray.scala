package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact substring-duplication detection via depth-truncated Manber–Myers
  * prefix doubling — the suffix-array formulation of Lee et al. 2022's
  * exact substring dedup (arXiv:2107.06499), distributed.
  *
  * [[Dedup.duplicatedSpanRanges]] detects duplicated `w`-token windows by
  * comparing 60-bit content hashes: exact modulo md5-60 collisions. This
  * operator computes the SAME cut list with NO hashing anywhere: window
  * identities are dense ranks built by prefix doubling (Manber & Myers
  * 1990), i.e. the first ceil(log2 w) rounds of distributed suffix-array
  * construction (the Flick & Aluru SC'15 scheme), truncated at depth `w`
  * because Lee et al.'s position-cut semantics only ever needs length-`w`
  * gram identities:
  *
  *   a position is cut iff it lies inside SOME duplicated substring of
  *   length >= w, and every such substring is tiled by duplicated
  *   w-grams, so {cut positions} == union of duplicated w-gram windows —
  *   the maximal cut ranges of the suffix-array formulation and of the
  *   w-window screen are IDENTICAL sets. (That equivalence is why q116
  *   shares q85's brute-force DuckDB oracle: two disjoint algorithms,
  *   one answer.)
  *
  * Scale shape — every step is corpus-distributed, nothing is
  * single-partition:
  *   1. rank_0 = dense id per distinct TOKEN: distinct -> total sort ->
  *      `zipWithIndex` (two passes, range-partitioned; NOT a global
  *      row_number window) -> broadcast-or-shuffle join back;
  *   2. each of the ceil(log2 w) doubling rounds joins rank_k at `p` with
  *      rank_k at `p + 2^k` (an `(id, p)`-keyed self-join — the shift is
  *      applied to the right side before the join, so both sides share
  *      the join key's partitioning) and densifies the pair the same way;
  *   3. a non-power-of-two `w` takes the standard sparse-table overlap:
  *      the w-gram id is (rank_q[p], rank_q[p + w - q]) for
  *      q = 2^floor(log2 w) — equality of the two overlapping q-grams
  *      decides equality of the w-gram;
  *   4. duplicated = w-gram id present in >= 2 DOCUMENTS, from the
  *      (gram, doc) distinct grain (two-level agg, no countDistinct
  *      Expand), matching the hash screen's `nd >= 2` semantics;
  *   5. the gaps-and-islands merge runs per-DOC (bounded by document
  *      length), identical to [[Dedup.duplicatedSpanRanges]].
  *
  * Full (untruncated) suffix ranks are the same loop run to
  * 2^k >= doc length; the truncation is what makes the operator one
  * log-factor-of-w pass over the corpus instead of log-of-corpus.
  *
  * Returns `(id, span_start, span_end, span_tokens)` — 1-based inclusive
  * token positions of each maximal duplicated range, byte-identical to
  * [[Dedup.duplicatedSpanRanges]] wherever md5-60 is collision-free.
  */
object SuffixArray {

  /** Dense ids for the distinct values of `keyCols`: distinct -> total
    * order -> RDD `zipWithIndex` -> join back. zipWithIndex is the
    * distributed dense-rank: it costs one extra job to count per-partition
    * sizes, never a single-partition window. Deterministic because the
    * sort is over the full distinct key. */
  private def densify(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val keys = df.select(keyCols.map(col): _*).distinct()
      .orderBy(keyCols.map(col): _*)
    val schema = keys.schema.add("__rank", LongType)
    val withId = spark.createDataFrame(
      keys.rdd.zipWithIndex.map { case (row, i) => Row.fromSeq(row.toSeq :+ i) },
      schema)
    df.join(withId, keyCols)
      .select(col("id"), col("p"), col("__rank"))
  }

  /** Longest cross-document duplicated substring per document, in tokens —
    * the capability the fixed-`w` tiling of [[exactDupSpanRanges]] cannot
    * express (a `w`-window screen answers "≥ w", not "how long").
    *
    * Same prefix-doubling loop run to FULL depth (2^K ≥ max doc length,
    * with an end-of-string sentinel that ranks below every real token, so
    * level-K ranks order the complete padded suffixes lexicographically),
    * then two classical facts do the rest:
    *
    *  - the longest substring of doc d that also occurs in another doc is
    *    realized by an ADJACENT different-doc pair in suffix order (all
    *    suffixes sharing the optimal prefix form a contiguous rank block
    *    that contains suffixes of ≥ 2 docs, so some adjacent pair inside
    *    the block crosses a doc boundary, and one side of the first such
    *    crossing seen from d's suffix belongs to d) — so a lag-1 pairing
    *    (`sidx` equi-join, never a nearest-different-doc scan) suffices;
    *  - LCP of a pair is recovered by the standard descending binary walk
    *    over the RETAINED rank tables: at span 2^k, equal ranks at the
    *    current offsets extend the match by 2^k. Padded equality near doc
    *    ends can only over-extend when both remaining suffixes are
    *    identical, so `least(lcp, rem_a, rem_b)` is exact.
    *
    * Scale shape: the doubling rounds are the q116 loop (per-round
    * localCheckpoint, zipWithIndex densify — never a global window); the
    * suffix order is one more range-partitioned sort + zipWithIndex; the
    * walk is 2(K+1) co-partitioned equi-joins over the ≤n cross-doc
    * adjacent pairs. Total O(n log n) with no single-partition stage.
    *
    * Returns `(id, max_dup_substring_tokens)` for EVERY input doc —
    * 0 when no token substring of the doc occurs in any other doc. */
  def maxDupSubstring(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs
      .select(col(idCol).as("id"), split(trim(lower(col(textCol))), "\\s+").as("t"))
      .select(col("id"), posexplode(col("t")).as(Seq("p0", "tok")))
      .select(col("id"), (col("p0") + 1).cast("long").as("p"), col("tok"))
      .localCheckpoint()
    val docLen = toks.groupBy("id").agg(max(col("p")).as("__len"))
    // one driver SCALAR (the doubling depth) — the standard iterative-
    // algorithm convergence read, not per-row driver data
    val maxLen = toks.agg(max(col("p"))).head().getLong(0)

    var ranks = densify(toks.withColumnRenamed("tok", "__k1"), Seq("__k1"))
      .localCheckpoint()
    var tables = List((1L, ranks)) // (span, rank table), spans DESCENDING head
    var span = 1L
    while (span < maxLen) {
      val right = ranks.select(col("id"), (col("p") - span).as("p"),
        col("__rank").as("__r2"))
      // LEFT join: positions whose 2^k partner falls past doc end keep a
      // -1 sentinel — end-of-string sorts below all real ranks, which is
      // what makes the final order lexicographic over padded suffixes
      val paired = ranks.join(right, Seq("id", "p"), "left")
        .select(col("id"), col("p"), col("__rank").as("__k1"),
          coalesce(col("__r2"), lit(-1L)).as("__k2"))
      span *= 2
      // the FINAL round's ranks feed only ordering (struct compare is
      // lexicographic field-wise — exactly the doubling order) and
      // equality tests in the walk, so the (r, r') pair itself is id
      // enough: skipping the last densify saves a full
      // distinct+sort+zipWithIndex+join cycle (the q116 move)
      ranks =
        if (span < maxLen) densify(paired, Seq("__k1", "__k2")).localCheckpoint()
        else paired.select(col("id"), col("p"),
          struct(col("__k1"), col("__k2")).as("__rank")).localCheckpoint()
      tables = (span, ranks) :: tables
    }

    // suffix order: range-partitioned sort + zipWithIndex (no global window)
    val saSchema = ranks.schema.add("__sidx", LongType)
    val sa = spark.createDataFrame(
      ranks.orderBy(col("__rank"), col("id"), col("p")).rdd
        .zipWithIndex.map { case (row, i) => Row.fromSeq(row.toSeq :+ i) },
      saSchema)
    val pairs0 = sa
      .select(col("__sidx"), col("id").as("id_a"), col("p").as("p_a"))
      .join(sa.select((col("__sidx") - 1).as("__sidx"),
        col("id").as("id_b"), col("p").as("p_b")), "__sidx")
      .where(col("id_a") =!= col("id_b"))
      .join(docLen.select(col("id").as("id_a"), col("__len").as("__la")), "id_a")
      .join(docLen.select(col("id").as("id_b"), col("__len").as("__lb")), "id_b")
      .select(col("id_a"), col("p_a"), col("id_b"), col("p_b"),
        (col("__la") - col("p_a") + 1).as("rem_a"),
        (col("__lb") - col("p_b") + 1).as("rem_b"),
        lit(0L).as("lcp"))

    // Pre-filter: a pair contributes only if LCP >= 1, i.e. the first
    // tokens agree (rank_0 equality). Dropped pairs have best = 0, which
    // the per-doc left join already defaults to — and the filter shrinks
    // the walk's input from all adjacent pairs to just the ones at a
    // shared-prefix boundary before the 2(K+1) walk joins run.
    val r0 = tables.last._2 // span-1 table (token ranks)
    val pairs1 = pairs0
      .join(r0.select(col("id").as("id_a"), col("p").as("p_a"),
        col("__rank").as("__r0a")), Seq("id_a", "p_a"))
      .join(r0.select(col("id").as("id_b"), col("p").as("p_b"),
        col("__rank").as("__r0b")), Seq("id_b", "p_b"))
      .where(col("__r0a") === col("__r0b"))
      .drop("__r0a", "__r0b")
    // Descending binary LCP walk over the retained tables. No per-round
    // checkpoint: unlike the doubling loop (where zipWithIndex is an
    // ACTION per round that would re-execute uncut lineage), the walk
    // fires no action until the final aggregate — one DAG, one execution.
    var pr = pairs1.localCheckpoint()
    for ((sp, tab) <- tables) { // tables is spans-DESCENDING by construction
      val ra = tab.select(col("id").as("id_a"), col("p").as("__qa"),
        col("__rank").as("__ra"))
      val rb = tab.select(col("id").as("id_b"), col("p").as("__qb"),
        col("__rank").as("__rb"))
      pr = pr
        .withColumn("__qa", col("p_a") + col("lcp"))
        .withColumn("__qb", col("p_b") + col("lcp"))
        .join(ra, Seq("id_a", "__qa"), "left")
        .join(rb, Seq("id_b", "__qb"), "left")
        .withColumn("lcp",
          when(col("__ra").isNotNull && col("__ra") === col("__rb"),
            col("lcp") + sp).otherwise(col("lcp")))
        .drop("__qa", "__qb", "__ra", "__rb")
    }

    val credit = pr
      .withColumn("best", least(col("lcp"), col("rem_a"), col("rem_b")))
      .select(col("id_a").as("id"), col("best"))
      .unionAll(pr
        .withColumn("best", least(col("lcp"), col("rem_a"), col("rem_b")))
        .select(col("id_b").as("id"), col("best")))
      .groupBy("id").agg(max(col("best")).as("__best"))
    docs.select(col(idCol).as("id")).distinct()
      .join(credit, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("__best"), lit(0L)).as("max_dup_substring_tokens"))
  }

  def exactDupSpanRanges(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 8): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1, got $windowTokens")
    val w = windowTokens

    val toks = docs
      .select(col(idCol).as("id"), split(trim(lower(col(textCol))), "\\s+").as("t"))
      .filter(size(col("t")) >= w)
      .select(col("id"), posexplode(col("t")).as(Seq("p0", "tok")))
      .select(col("id"), (col("p0") + 1).cast("long").as("p"), col("tok"))

    // rank_0: 1-gram (token) identities. Each round is localCheckpointed:
    // zipWithIndex launches its own partition-size job per round, and
    // without the lineage cut that job re-executes every PRIOR round's
    // sort — turning log2(w) rounds into a quadratic amount of work
    // (measured ~4x on the bench corpus at w=8).
    var ranks = densify(toks.withColumnRenamed("tok", "__k1"), Seq("__k1"))
      .localCheckpoint()
    var span = 1L
    while (span * 2 <= w) {
      val right = ranks.select(col("id"), (col("p") - span).as("p"),
        col("__rank").as("__r2"))
      val paired = ranks.join(right, Seq("id", "p"))
        .select(col("id"), col("p"), col("__rank").as("__k1"), col("__r2").as("__k2"))
      // the FINAL round's ranks feed only equality tests (the duplicated-
      // gram count, or the overlap struct below — struct equality nests
      // fine), so the (r, r') pair itself is id enough: skipping the last
      // densify saves a full distinct+sort+zipWithIndex+join cycle
      span *= 2
      ranks =
        if (span * 2 <= w)
          densify(paired, Seq("__k1", "__k2")).localCheckpoint()
        else paired.select(col("id"), col("p"),
          struct(col("__k1"), col("__k2")).as("__rank"))
    }
    // sparse-table overlap for non-power-of-two w (no-op join when w == span)
    val gram =
      if (span == w) ranks
      else {
        val right = ranks.select(col("id"), (col("p") - (w - span)).as("p"),
          col("__rank").as("__r2"))
        ranks.join(right, Seq("id", "p"))
          .select(col("id"), col("p"),
            struct(col("__rank"), col("__r2")).as("__rank"))
      }

    // duplicated = gram id in >= 2 docs, from the (gram, doc) grain
    val dupIds = gram.select(col("__rank"), col("id")).distinct()
      .groupBy("__rank").agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= 2)
      .select("__rank")
    val dup = gram.join(dupIds, Seq("__rank"), "left_semi")

    val wDoc = Window.partitionBy("id").orderBy("p")
    val prev = lag(col("p"), 1).over(wDoc)
    dup
      .withColumn("brk",
        when(prev.isNull || col("p") - prev > w, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(wDoc))
      .groupBy("id", "island")
      .agg(min(col("p")).as("span_start"),
        (max(col("p")) + (w - 1)).as("span_end"))
      .withColumn("span_tokens", col("span_end") - col("span_start") + 1)
      .drop("island")
  }
}
