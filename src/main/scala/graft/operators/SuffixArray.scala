package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
  *   1. rank_0 = dense id per distinct TOKEN, assigned by ONE sorted
  *      scan ([[scanRanks]]: range-partitioned sort, per-partition group
  *      stats, driver prefix offsets — NOT a global row_number window);
  *   2. each of the ceil(log4 w) RADIX-4 rounds ranks the 4-tuple
  *      (r_q(p), r_q(p+q), r_q(p+2q), r_q(p+3q)) — partner ranks come
  *      from a per-doc window `lead` (one exchange, partitions bounded
  *      by doc length), never an (id, p) self-join;
  *   3. the final w-gram (q ≤ w < 4q) is the sparse-table overlap cover:
  *      q-gram components at starts 0, q, 2q, … capped by w−q tile
  *      [0, w) completely, so component equality IS w-gram equality and
  *      the last round never pays a ranking pass;
  *   4. duplicated = w-gram id present in >= 2 DOCUMENTS, from the
  *      (gram, doc) distinct grain (two-level agg, no countDistinct
  *      Expand), matching the hash screen's `nd >= 2` semantics;
  *   5. the gaps-and-islands merge runs per-DOC (bounded by document
  *      length), identical to [[Dedup.duplicatedSpanRanges]].
  *
  * Full (untruncated) suffix ranks are the same loop run to
  * 4^k >= doc length; the truncation is what makes the operator one
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

  /** Dense rank of `keyCols` assigned by ONE sorted scan — the cheaper
    * sibling of [[densify]] for tables that carry exactly `(id, p)` next
    * to the key: sort the FULL table by key (one range exchange), count
    * key-GROUPS per partition (one small stats job; first/last keys catch
    * groups spanning partition boundaries), prefix-sum the offsets on the
    * driver (bytes per partition, never row data), then assign ranks in
    * the same sorted pass. No `distinct`, no join-back — per round this
    * replaces densify's 4-5 exchanges + 2 jobs with 1 exchange + 1 stats
    * job (measured 2-3x per-round on the q208 corpus).
    *
    * Returns `((id, p, __rank), nGroups)` — the distinct-key count comes
    * free from the stats pass (the Manber–Myers early-exit read).
    * Deterministic: ranks depend only on the total key order.
    *
    * INVARIANT (two passes, one partitioning): the stats job and the
    * rank-assignment pass run over the SAME sorted RDD object, and the
    * driver-computed offsets are only valid if both passes see identical
    * partition boundaries and identical within-partition order. The
    * `localCheckpoint` below pins that: the stats collect materializes the
    * sorted partitions and the rank pass reads the cached copy — never a
    * re-executed sort. Do NOT split the two passes across separately
    * planned DataFrames (each plan would re-sample range boundaries); the
    * cross-partition boundary-merge path is pinned by SuffixArraySpec's
    * r12 differential test. */
  private def scanRanks(
      df: DataFrame, keyCols: Seq[String]): (DataFrame, Long) = {
    val spark = df.sparkSession
    val cols = keyCols.map(col) ++ Seq(col("id"), col("p"))
    val sorted = df.select(cols: _*).orderBy(keyCols.map(col): _*)
    val nk = keyCols.length
    val rdd = sorted.rdd
    // cache the sorted scan at first compute (the stats job): the rank
    // pass then reads the materialized partitions instead of re-running
    // the per-partition sort and relying on deterministic re-execution
    rdd.localCheckpoint()
    // per-partition (group count, first key, last key); key equality over
    // the leading nk fields
    def keyOf(r: Row): Seq[Any] = (0 until nk).map(r.get)
    val stats = rdd.mapPartitionsWithIndex { (pi, it) =>
      var groups = 0L
      var first: Seq[Any] = null
      var prev: Seq[Any] = null
      while (it.hasNext) {
        val k = keyOf(it.next())
        if (prev == null || k != prev) { groups += 1; if (first == null) first = k }
        prev = k
      }
      Iterator.single((pi, groups, first, prev))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](stats.length)
    var acc = 0L
    var prevLast: Seq[Any] = null
    for ((pi, groups, first, last) <- stats) {
      // a key group split across partitions must not count twice
      val adj = if (first != null && first == prevLast) -1L else 0L
      offsets(pi) = acc + adj
      acc += adj + groups
      if (last != null) prevLast = last
    }
    val nGroups = acc
    val outSchema = StructType(Seq(
      StructField("id", sorted.schema("id").dataType, nullable = false),
      StructField("p", LongType, nullable = false),
      StructField("__rank", LongType, nullable = false)))
    val idIdx = nk
    val pIdx = nk + 1
    val out = spark.createDataFrame(
      rdd.mapPartitionsWithIndex { (pi, it) =>
        var rank = offsets(pi) - 1L
        var prev: Seq[Any] = null
        it.map { r =>
          val k = keyOf(r)
          if (prev == null || k != prev) rank += 1
          prev = k
          Row(r.get(idIdx), r.getLong(pIdx), rank)
        }
      }, outSchema)
    (out, nGroups)
  }

  /** Longest cross-document duplicated substring per document, in tokens —
    * the capability the fixed-`w` tiling of [[exactDupSpanRanges]] cannot
    * express (a `w`-window screen answers "≥ w", not "how long").
    *
    * Same prefix-doubling loop run to FULL depth (radix-4: tuple span
    * 4·t ≥ max doc length, with an end-of-string sentinel that ranks
    * below every real token, so the top level's tuples order the
    * complete padded suffixes lexicographically), then two classical
    * facts do the rest:
    *
    *  - the longest substring of doc d that also occurs in another doc is
    *    realized by an ADJACENT different-doc pair in suffix order (all
    *    suffixes sharing the optimal prefix form a contiguous rank block
    *    that contains suffixes of ≥ 2 docs, so some adjacent pair inside
    *    the block crosses a doc boundary, and one side of the first such
    *    crossing seen from d's suffix belongs to d) — so a lag-1 pairing
    *    (`sidx` equi-join, never a nearest-different-doc scan) suffices;
    *  - LCP of a pair is recovered by a descending BASE-4 walk over the
    *    RETAINED tuple tables: at level t, the count of leading element
    *    matches is the pair's base-4 LCP digit (each match extends the
    *    common prefix by t). Padded equality near doc ends can only
    *    over-extend when both remaining suffixes are identical, so
    *    `least(lcp, rem_a, rem_b)` is exact.
    *
    * Scale shape: the ranking rounds are the q116 loop ([[scanRanks]]
    * one-sorted-scan ranking, window-`lead` partners, per-round
    * localCheckpoint — never a global window); the suffix order is one
    * more range-partitioned sort + zipWithIndex; the walk is 2 per-level
    * equi-joins over the ≤n cross-doc adjacent pairs — half the binary
    * walk's join count. Total O(n log n) with no single-partition stage,
    * and the Manber–Myers unique-rank early exit stops the loop as soon
    * as every suffix is distinguished.
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
    // two driver SCALARS (the doubling depth + the early-exit target) —
    // the standard iterative-algorithm convergence reads, not per-row
    // driver data
    val maxLen = toks.agg(max(col("p"))).head().getLong(0)
    val nPos = toks.count()

    // RADIX-4 prefix doubling: each level ranks the 4-tuple
    // (r_t(p), r_t(p+t), r_t(p+2t), r_t(p+3t)) — the 4t-gram identity —
    // so ceil(log4 maxLen) ranking rounds replace ceil(log2 maxLen), and
    // the walk needs half the tables. Lexicographic order over the tuple
    // IS the padded-prefix order at 4t, identical to two binary doubling
    // steps; the -1 sentinel (position past doc end) sorts below every
    // real rank, which keeps the order lexicographic over PADDED
    // suffixes. Partner ranks come from a per-doc window `lead` (one
    // exchange, partition sizes bounded by doc length) instead of the
    // historical (id, p)-shifted self-join (two exchanges).
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("p")
    def tupleAt(r: DataFrame, t: Long): DataFrame = {
      require(3 * t <= Int.MaxValue, s"lead offset overflow at span $t")
      r.select(col("id"), col("p"), col("__rank").as("__e0"),
        coalesce(lead(col("__rank"), t.toInt).over(wDoc), lit(-1L)).as("__e1"),
        coalesce(lead(col("__rank"), (2 * t).toInt).over(wDoc), lit(-1L)).as("__e2"),
        coalesce(lead(col("__rank"), (3 * t).toInt).over(wDoc), lit(-1L)).as("__e3"))
    }
    val tupleKeys = Seq("__e0", "__e1", "__e2", "__e3")

    val (r0raw, d0) = scanRanks(
      toks.withColumnRenamed("tok", "__k1"), Seq("__k1"))
    var ranks = r0raw.localCheckpoint()
    val r0 = ranks // span-1 token ranks (the walk pre-filter's table)
    var d = d0
    // (span, tuple table) per level, spans DESCENDING at the head; level
    // t's tuple answers "do the next t·i tokens match" for i = 1..3 via
    // leading-element equality — the walk consumes exactly that.
    var tables = List.empty[(Long, DataFrame)]
    var span = 1L
    var done = false
    while (!done) {
      // Manber–Myers early exit: every suffix holds a unique rank at the
      // current span, so all cross-suffix LCPs are < span — the levels
      // already built (spans span/4 .. 1, summing to span−1 of coverage)
      // answer every walk, the order is final, and no further level is
      // needed. scanRanks hands the distinct count over for free from
      // its stats pass.
      if (d == nPos) done = true
      else {
        val tup = tupleAt(ranks, span).localCheckpoint()
        tables = (span, tup) :: tables
        // natural exit: this level's tuples order the full padded
        // suffixes (4·span ≥ maxLen)
        if (4 * span >= maxLen) done = true
        else {
          val (nr, nd) = scanRanks(tup, tupleKeys)
          ranks = nr.localCheckpoint()
          d = nd
            span *= 4
        }
      }
    }

    // suffix order: range-partitioned sort + zipWithIndex (no global
    // window). With the unique-rank exit the converged rank table orders
    // the suffixes on its own; otherwise the top tuple (span 4t ≥ maxLen)
    // is the padded-suffix order.
    val ordTable = if (d == nPos) ranks else tables.head._2
    val ordCols: Seq[Column] =
      (if (d == nPos) Seq(col("__rank")) else tupleKeys.map(col)) ++
        Seq(col("id"), col("p"))
    val ordered = ordTable.orderBy(ordCols: _*).select(col("id"), col("p"))
    val saSchema = StructType(Seq(
      StructField("id", ordTable.schema("id").dataType, nullable = false),
      StructField("p", LongType, nullable = false),
      StructField("__sidx", LongType, nullable = false)))
    val sa = spark.createDataFrame(
      ordered.rdd.zipWithIndex.map { case (row, i) => Row.fromSeq(row.toSeq :+ i) },
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
    // shared-prefix boundary before the walk joins run.
    val pairs1 = pairs0
      .join(r0.select(col("id").as("id_a"), col("p").as("p_a"),
        col("__rank").as("__r0a")), Seq("id_a", "p_a"))
      .join(r0.select(col("id").as("id_b"), col("p").as("p_b"),
        col("__rank").as("__r0b")), Seq("id_b", "p_b"))
      .where(col("__r0a") === col("__r0b"))
      .drop("__r0a", "__r0b")
    // Descending base-4 LCP walk: at level t the pair fetches BOTH
    // tuples once and counts LEADING element matches in-row — each match
    // extends the common prefix by t, and the count is the pair's base-4
    // LCP digit (a 4th match would mean 4t common tokens, excluded by
    // the higher level having run first). Two joins per LEVEL — half the
    // binary walk's join count for the same information. A missing row
    // (offset past doc end) left-join-misses to nulls → digit 0, and
    // matching -1 sentinels only over-extend when both suffixes are
    // identical to their ends, which `least(lcp, rem_a, rem_b)` clamps —
    // both exactly the binary walk's semantics. No per-level checkpoint:
    // the walk fires no action until the final aggregate.
    var pr = pairs1.localCheckpoint()
    for ((sp, tab) <- tables) { // spans DESCENDING by construction
      val ra = tab.select((col("id").as("id_a") +: col("p").as("__qa") +:
        tupleKeys.map(k => col(k).as(k + "a"))): _*)
      val rb = tab.select((col("id").as("id_b") +: col("p").as("__qb") +:
        tupleKeys.map(k => col(k).as(k + "b"))): _*)
      val digit =
        when(col("__e0a") === col("__e0b"),
          when(col("__e1a") === col("__e1b"),
            when(col("__e2a") === col("__e2b"),
              when(col("__e3a") === col("__e3b"), 4L).otherwise(3L))
              .otherwise(2L))
            .otherwise(1L))
          .otherwise(0L)
      pr = pr
        .withColumn("__qa", col("p_a") + col("lcp"))
        .withColumn("__qb", col("p_b") + col("lcp"))
        .join(ra, Seq("id_a", "__qa"), "left")
        .join(rb, Seq("id_b", "__qb"), "left")
        .withColumn("lcp",
          col("lcp") + lit(sp) * coalesce(digit, lit(0L)))
        .drop((Seq("__qa", "__qb") ++
          tupleKeys.map(_ + "a") ++ tupleKeys.map(_ + "b")): _*)
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

    // rank_0: 1-gram (token) identities via the one-sorted-scan ranking
    // ([[scanRanks]] — no distinct, no join-back), then RADIX-4 rounds:
    // each level ranks the 4-tuple (r_q(p), r_q(p+q), r_q(p+2q),
    // r_q(p+3q)) — partner ranks come from a per-doc window `lead` (one
    // exchange) instead of the historical (id, p)-shifted self-join.
    // Rows whose 4q-window runs past the doc end drop (inner-join
    // semantics: a gram exists only where its full window fits). Each
    // level is localCheckpointed: scanRanks' stats pass is an action per
    // round that would otherwise re-execute uncut lineage.
    val wDoc = Window.partitionBy("id").orderBy("p")
    var ranks = scanRanks(
      toks.withColumnRenamed("tok", "__k1"), Seq("__k1"))._1.localCheckpoint()
    var span = 1L
    while (span * 4 < w) {
      val tup = ranks.select(col("id"), col("p"), col("__rank").as("__e0"),
        lead(col("__rank"), span.toInt).over(wDoc).as("__e1"),
        lead(col("__rank"), (2 * span).toInt).over(wDoc).as("__e2"),
        lead(col("__rank"), (3 * span).toInt).over(wDoc).as("__e3"))
        .filter(col("__e3").isNotNull)
      span *= 4
      ranks = scanRanks(tup, Seq("__e0", "__e1", "__e2", "__e3"))._1
        .localCheckpoint()
    }
    // sparse-table overlap cover for the final w-gram (span ≤ w < 4·span):
    // q-grams at starts 0, q, 2q, … capped by the overlapping tail start
    // w−q tile [0, w) completely, so component-wise equality IS w-gram
    // equality — the classic trick, generalized to up to 4 components so
    // the last ranking round is never spent on a densify the equality
    // tests don't need (the q116 skip-last-densify move, radix-4 form).
    val gram =
      if (span == w) ranks
      else {
        val starts = ((span until (w - span) by span) :+ (w - span)).distinct
        val comps = col("__rank").as("__c0") +: starts.zipWithIndex.map {
          case (off, i) =>
            lead(col("__rank"), off.toInt).over(wDoc).as(s"__c${i + 1}")
        }
        ranks.select((Seq(col("id"), col("p")) ++ comps): _*)
          .filter(col(s"__c${starts.length}").isNotNull)
          .select(col("id"), col("p"),
            struct((0 to starts.length).map(i => col(s"__c$i")): _*).as("__rank"))
      }

    // duplicated = gram id in >= 2 docs, from the (gram, doc) grain
    val dupIds = gram.select(col("__rank"), col("id")).distinct()
      .groupBy("__rank").agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= 2)
      .select("__rank")
    val dup = gram.join(dupIds, Seq("__rank"), "left_semi")

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
