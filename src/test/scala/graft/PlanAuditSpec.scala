package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan assertions — the 100 TB posture enforced as tests, not
  * prose. A plan regression (a broadcast that silently becomes a shuffle
  * join, a projection that stops pruning the parquet scan, a global sort
  * where a top-k should be) is a scale bug even when row-level results stay
  * correct, so the shapes are pinned here. */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): SparkPlan =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan

  private def planString(q: String): String = plan(q).toString

  test("q02 joins every dim via broadcast — no shuffle join anywhere") {
    val p = planString("q02_region_revenue")
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "fact-dim chain must not shuffle-join:\n" + p.take(2000))
  }

  test("q01 scan prunes to exactly the referenced lineitem columns") {
    val p = planString("q01_pricing_pivot")
    // the scan's output column list (ReadSchema renders truncated)
    val scanCols = "FileScan parquet \\[([^\\]]*)\\]".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    for (c <- Seq("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"))
      assert(scanCols.contains(c), s"$c must be read: $scanCols")
    for (c <- Seq("l_orderkey", "l_partkey", "l_shipdate", "l_tax", "l_comment"))
      assert(!scanCols.contains(c), s"$c must be pruned: $scanCols")
  }

  test("q28 top-k is TakeOrderedAndProject, never a global sort") {
    val p = planString("q28_topk_composite")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!p.contains("\nSort ") && !p.contains("+- Sort "), "no global sort")
  }

  test("q36 hash-ordered sample is also a bounded top-k") {
    val p = planString("q36_random_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q12 pagination bounds the sort: top-k feeds a tiny page window") {
    val p = planString("q12_pagination")
    assert(p.contains("TakeOrderedAndProject"),
      "pagination must not globally sort the table:\n" + p.take(1500))
  }

  test("filter pushdown reaches the parquet scan (q16 query-vector filter)") {
    val p = planString("q16_cosine_knn")
    assert("PushedFilters: \\[[^\\]]*LessThan\\(vec_id,10\\)".r.findFirstIn(p).isDefined
      || p.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,10)]"),
      "vec_id < 10 must push to the scan:\n" +
        "PushedFilters[^\\n]*".r.findAllIn(p).mkString("\n"))
  }

  test("whole-stage codegen covers the hot aggregation paths") {
    // an unexecuted adaptive plan hides codegen spans — plan once with AQE
    // off to see the static codegen grouping
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("q01_pricing_pivot", "q13_token_stats", "q41_quality_score")) {
        val p = SparkEntry.queries(q)(spark, dir).queryExecution
          .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        // '*'-prefixed operators are inside a WholeStageCodegen span
        assert(p.contains("* HashAggregate") || p.contains("* Project"),
          s"$q lost codegen:\n" + p.take(1200))
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("narrative rollup is two chained aggregates — no join, no window") {
    val p = planString("q29_narrative_rollup")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "single-pass pipeline must not join:\n" + p.take(2000))
    assert(!p.contains("WindowExec"), "no window in the rollup")
  }

  test("q17 IVF: bucket assignment is a pure projection — one window, one hash exchange") {
    // round-2 shape windowed corpus x nlist rows (an Exchange per side);
    // the literal-argmax assignment must leave the ONLY hash exchange at
    // the final per-query rank window
    val p = planString("q17_cosine_ivf")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges <= 1, s"corpus assignment must not shuffle ($hashExchanges):\n" + p.take(2500))
    // "Window [" is the window exec; WindowGroupLimit lines are the top-k
    // pushdown around it and are expected
    val windows = "Window \\[".r.findAllIn(p).size
    assert(windows <= 1, s"only the final rank window may remain ($windows)")
  }

  test("q49 chunking is shuffle-free: the only exchange is the query's final sort") {
    val p = planString("q49_chunking")
    assert(!p.contains("Exchange hashpartitioning"),
      "chunk explode must inherit scan partitioning:\n" + p.take(2000))
  }

  test("q52 as-of join is a union-sort, not a join: zero join operators") {
    val p = planString("q52_asof_join")
    assert(!p.contains("Join"), "as-of must not plan any join:\n" + p.take(2000))
    assert(p.contains("Union"), "tagged union expected")
    assert("Window \\[".r.findAllIn(p).size == 1, "one propagation window")
  }

  test("q53 range join is an equi-join on bins: no cartesian/nested-loop") {
    val p = planString("q53_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "binned range join must never plan a product:\n" + p.take(2000))
  }

  test("q56 bm25: query/df tables broadcast; no cartesian product") {
    val p = planString("q56_bm25_topk")
    assert(p.contains("BroadcastHashJoin"), "query vocabulary must broadcast")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "no corpus-scale shuffle join in the scoring chain:\n" + p.take(2000))
  }

  test("bm25 DataFrame-queries overload: semi-join vocab prune broadcasts; no product") {
    // the unbounded-query-set path must keep the q56 plan shape with the
    // isin literal list replaced by a broadcast LEFT SEMI prune
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val qt = spark.createDataFrame(Seq((1, "the"), (1, "data"), (2, "model")))
      .toDF("query_id", "term")
    val p = graft.operators.TextSearch.bm25TopK(docs, "doc_id", "text", qt, 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "vocabulary prune must be a broadcast semi-join:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "no corpus-scale shuffle join in the scoring chain:\n" + p.take(2000))
  }

  test("q59 contamination: test vocabulary broadcast-pruned before the count shuffle") {
    val p = planString("q59_contamination")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "corpus gram stream must semi-join the broadcast test vocabulary:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q62 quality gate: exact-quantile thresholds broadcast back, no window, no sort-merge") {
    val p = planString("q62_quality_gate")
    assert(p.contains("BroadcastHashJoin"), "threshold table must broadcast:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      "no per-group value buffering may appear:\n" + p.take(2000))
  }

  test("q64 per-key sample: rank window is WindowGroupLimit-bounded") {
    val p = planString("q64_per_key_sample")
    assert(p.contains("WindowGroupLimit"),
      "per-key top-k must push the rank limit into per-partition heaps:\n" + p.take(2000))
  }

  test("q33 banded hyperplane LSH: no cartesian/self-join — bucket-harvest only") {
    val p = planString("q33_embedding_neardup")
    assert(!p.contains("CartesianProduct"), "no cartesian pair expansion")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
      && !p.contains("BroadcastHashJoin"),
      "pairs must come from the in-bucket expansion, not a join:\n" + p.take(2500))
  }

  test("q67 semantic dedup: pairing is cluster-harvest, no cartesian, one label join") {
    val p = planString("q67_semantic_dedup")
    assert(!p.contains("CartesianProduct"), "no all-pairs expansion")
    // the ONLY join allowed is the final id⟕component label join (id-keyed
    // equi-join; AQE broadcasts it when labels are small). The pair stage
    // itself must be the in-cluster collect+expand, never a self-join.
    val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(p).size
    assert(joins <= 1, s"expected at most the label join, found $joins:\n" + p.take(2500))
    // the pairing subtree itself is invisible here (connectedComponents
    // localCheckpoints its labels, truncating lineage to Scan ExistingRDD);
    // its harvest shape is pinned by the q33 bucket-harvest test, which
    // shares bucketPairs
  }

  test("q233 dual-hash pairing: band-bucket harvest, no cartesian, only the two capped group-expansion joins") {
    val p = planString("q233_dhash_neardup")
    assert(!p.contains("CartesianProduct"), "no all-pairs image join")
    // allowed joins: repPairs ⟕ groups(ra) and ⟕ groups(rb) — rep-keyed
    // equi-joins of the flood-capped fingerprint-group table; the pair
    // candidates themselves come from the in-bucket expansion
    val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(p).size
    assert(joins <= 2, s"expected at most the two group-expansion joins, found $joins:\n" + p.take(2500))
  }

  test("q234 leakage audit: pair-table joins only — no cartesian beyond 1-row scalar crossJoins") {
    val p = planString("q234_group_leakage")
    assert(!p.contains("CartesianProduct"), "no unbounded cartesian")
    // the lazy-scalar idiom (1-row aggregate crossJoins) surfaces as
    // BroadcastNestedLoopJoin — every other join must be an equi-join of
    // the flood-capped pair table against the (id, group) projection
    // (shuffle-on-id; the doc table is never assumed broadcastable)
    assert(!p.contains("ShuffledNestedLoop"), "nested loops must be 1-row broadcasts")
  }

  test("q237 audio fingerprint pairing: band-bucket harvest, no cartesian") {
    val p = planString("q237_audio_fingerprint")
    assert(!p.contains("CartesianProduct"), "no all-pairs audio join")
    // same topology as q233 with ONE hash family: the only joins are the
    // two rep-keyed group-expansion equi-joins of the flood-capped
    // fingerprint-group table
    val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(p).size
    assert(joins <= 2, s"expected at most the two group-expansion joins, found $joins:\n" + p.take(2500))
  }

  test("q238 video frame-sig pairing: bucket harvest + two count joins, no cartesian") {
    val p = planString("q238_video_framesig")
    assert(!p.contains("CartesianProduct"), "no all-pairs video join")
    // pairs come from the in-bucket expansion over (frame, fingerprint)
    // buckets; the only joins attach each side's sampled-frame count
    val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(p).size
    assert(joins <= 2, s"expected at most the two frame-count joins, found $joins:\n" + p.take(2500))
  }

  test("q239 media manifest: components truncate lineage, two label joins, no cartesian") {
    val p = planString("q239_media_dedup_manifest")
    assert(!p.contains("CartesianProduct"), "no all-pairs expansion")
    // connectedComponents localCheckpoints its labels (over the REP graph
    // — the expanded pair union is never executed on this path); the
    // visible plan is members ⟕ components (rep-keyed) then docs ⟕
    // labeled (id-keyed). The three modality harvests' shapes are pinned
    // by the q233/q237/q238 tests.
    val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(p).size
    assert(joins <= 2, s"expected the two label joins, found $joins:\n" + p.take(2500))
  }

  test("q240 component split: pair-table joins only — no cartesian beyond 1-row scalar crossJoins") {
    val p = planString("q240_component_split")
    assert(!p.contains("CartesianProduct"), "no unbounded cartesian")
    assert(!p.contains("ShuffledNestedLoop"), "nested loops must be 1-row broadcasts")
  }

  test("q241 image-caption cells: two harvests + one pair-grain outer join, no cartesian") {
    val p = planString("q241_image_caption_cells")
    assert(!p.contains("CartesianProduct"), "no all-pairs expansion")
    assert(!p.contains("ShuffledNestedLoop"), "no nested-loop joins")
  }

  test("q236 image dedup groups: label propagation truncates lineage, no cartesian") {
    val p = planString("q236_image_dedup_groups")
    assert(!p.contains("CartesianProduct"), "no all-pairs expansion")
    // r12 rep-grain form: CC runs on rep pairs (localCheckpointed labels,
    // invisible here — the q67 posture) and the visible plan is the
    // bounded member-labeling: members ⋈ group sizes ⋈ rep components —
    // three joins on group-grain tables, never the Σ group² expansion
    // (whose harvest shape stays pinned by the q233 test: shared
    // bucketPairs + group expansion)
    val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(p).size
    assert(joins <= 3,
      s"expected the member/size/component labeling joins, found $joins:\n" +
        p.take(2500))
  }

  test("q68 duplicated spans: window-hash grain only — zero join operators") {
    val p = planString("q68_dup_spans")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      "doc counts per window must come from a window fn, not a self-join:\n" + p.take(2500))
  }

  test("q69 keywords: per-doc top-k rank is WindowGroupLimit-bounded, no join") {
    val p = planString("q69_keywords")
    assert(p.contains("WindowGroupLimit"),
      "per-doc top-k must push the rank limit into per-partition heaps:\n" + p.take(2000))
    assert(!p.contains("Join"), "df must come from a window, not a vocab join")
  }

  test("q71 weighted sample is a bounded top-k, never a global sort") {
    val p = planString("q71_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q72 vocab encode: vocabulary joins broadcast, no corpus shuffle join") {
    val p = planString("q72_token_ids")
    assert(p.contains("BroadcastHashJoin"), "vocab must broadcast:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(2000))
  }

  test("q73 length batches: offsets broadcast back; rank windows are length-partitioned") {
    val p = planString("q73_length_batches")
    assert(p.contains("BroadcastHashJoin"),
      "length offsets must broadcast:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(2000))
  }

  test("q77 deciles: no per-language ntile window; offsets broadcast back") {
    val p = planString("q77_quality_deciles")
    // ntile would mean a whole language in one window partition (English is
    // ~half a pretraining corpus); the tile must come from histogram rank
    assert(!p.toLowerCase.contains("ntile"), "no ntile anywhere:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "histogram offsets must broadcast back:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(2000))
    // every corpus-grain window (= ordered by doc_id) partitions by
    // (lang, n_chars), never lang alone; windows over the tiny histogram
    // table order by __val and are exempt. Window exec renders as
    // "Window [fns], [partSpec], [orderSpec]".
    val windowSpecs = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(m => (m.group(1), m.group(2))).toSeq
    val corpusGrain = windowSpecs.filter(_._2.contains("doc_id"))
    assert(corpusGrain.nonEmpty, s"expected a doc_id-ordered rank window: $windowSpecs")
    assert(corpusGrain.forall { case (part, _) =>
      part.contains("lang") && part.contains("n_chars") },
      s"corpus windows must co-partition by value: $windowSpecs")
  }

  test("q85 span ranges: no pair expansion, every window hash-partitioned") {
    val p = planString("q85_dup_span_ranges")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "span merge must never expand pairs:\n" + p.take(2000))
    // all windows partition by the span hash or the doc id — an empty
    // partition spec would mean a single-partition corpus window
    assert(!"Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(p).isDefined,
      "no unpartitioned window:\n" + p.take(2000))
  }

  test("q87 span cut: ranges fold per doc, cut is in-row, no pair expansion") {
    val p = planString("q87_cut_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the cut must never expand pairs:\n" + p.take(2000))
    assert(!"Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(p).isDefined,
      "no unpartitioned window:\n" + p.take(2000))
  }

  test("q88 bpe pairs: two hash aggs (corpus once, then vocab grain), bounded top-k") {
    val p = planString("q88_bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must be a bounded top-k, not a global sort:\n" + p.take(2000))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2,
      s"expected the word agg + pair agg exchanges only, found $exchanges:\n" + p.take(2000))
    assert(!p.contains("Join"), "no join anywhere:\n" + p.take(2000))
  }

  test("q90 funnel: ONE hash exchange on the user key for the whole step chain") {
    val p = planString("q90_funnel")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"windows + collapse must reuse a single user_id partitioning, found $exchanges:\n" +
        p.take(2500))
    assert(!p.contains("Join"), "the step chain must not join:\n" + p.take(2000))
  }

  test("q92 heavy hitters: candidate recount joins via broadcast, never shuffle") {
    val p = planString("q92_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"),
      "candidate filter must broadcast:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "no shuffle join in the recount pass:\n" + p.take(2000))
  }

  test("q93 vocab coverage: bounded vocab broadcasts; top-k is TakeOrdered") {
    val p = planString("q93_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      "vocab bound must be a top-k, not a global sort:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "vocab must broadcast against the token stream:\n" + p.take(2000))
  }

  test("q75 interval overlap is an equi-join on bins: no cartesian/nested-loop") {
    val p = planString("q75_interval_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "overlap must bin to an equi-join:\n" + p.take(2000))
  }

  test("q78 cdc chunking is shuffle-free: the only exchange is the final sort") {
    val p = planString("q78_cdc_chunks")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected only the orderBy exchange, found $exchanges:\n" +
      p.take(2000))
    assert(!p.contains("Join") && !p.contains("Window "), p.take(2000))
  }

  test("q113 screen: codegen'd sorted-intersect over shuffle-hash joins, no cartesian") {
    val p = planString("q113_set_similarity")
    assert(p.contains("graft_sorted_intersect"),
      "the screen must use the native two-pointer expression:\n" + p.take(2500))
    assert(p.contains("ShuffledHashJoin"),
      "array-carrying screen joins must be hash, not sort-merge:\n" + p.take(2500))
    // the only nested-loop is the provably-empty collision-fallback side
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q116 prefix doubling: every Window partitions by the doc id, never corpus-wide") {
    val p = planString("q116_sa_dup_ranges")
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(windows.nonEmpty, "expected the islands window:\n" + p.take(2000))
    for (w <- windows)
      assert(w.contains("id"), s"corpus-wide window partition: [$w]\n" + p.take(2000))
  }

  test("q117 collocations: top-k is TakeOrderedAndProject, counts broadcast back") {
    val p = planString("q117_collocations")
    assert(p.contains("TakeOrderedAndProject"),
      "lift top-k must not globally sort the bigram table:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q119 RRF fusion: windows partition by query, no cartesian") {
    val p = planString("q119_hybrid_rrf")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(windows.nonEmpty)
    for (w <- windows)
      assert(w.contains("query_id"),
        s"rank window must stay query-grain: [$w]\n" + p.take(2000))
  }

  test("q120 PageRank: no cartesian, no window — joins and hash aggregates only") {
    val p = planString("q120_pagerank")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("Window "), "iterations must not introduce windows")
    assert(p.contains("TakeOrderedAndProject"),
      "top-100 must not globally sort the node table:\n" + p.take(2000))
  }

  test("q118 group split: assignment never shuffles before the audit aggregate") {
    val p = planString("q118_group_split")
    // exchanges: group-grain agg, split-grain agg (+AQE coalesces); the
    // assignment itself must contribute none — it is a pure projection
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("Window "), "no window in a pure hash assignment")
  }

  test("q123 LM familiarity: the bigram model joins via broadcast, no window") {
    val p = planString("q123_lm_familiarity")
    assert(p.contains("BroadcastHashJoin"),
      "the vocabulary-grain model table must broadcast:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("Window "),
      "scoring is one doc-id aggregate — no sort-merge join, no window:\n" +
        p.take(2000))
  }

  test("q124 DSIR: O(buckets) table broadcasts; top-k never globally sorts") {
    val p = planString("q124_dsir_weights")
    assert(p.contains("BroadcastHashJoin"),
      "the bucket distribution must broadcast:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"),
      "corpus top-k must be a bounded heap, the rank window only sees k rows:\n" +
        p.take(2000))
  }

  test("q125 sliding distinct: interval-delta kernel — key-partitioned windows only") {
    val p = planString("q125_sliding_distinct")
    // the W-times contribution explode is gone: no `sequence(` fan-out
    // anywhere except the day-grain spine (which explodes from the 1-row
    // bounds, so it appears under a single-row aggregate, not the pairs)
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(windows.nonEmpty,
      "islands + day-spine running sum are window-based now:\n" + p.take(2000))
    // every window is either per-key (__k: the gaps-and-islands lag/sum)
    // or the annotated bounded day-spine (constant partition key)
    assert(windows.forall(w => w.contains("__k") || w.trim == "0"),
      s"windows must partition by key or carry the lit(0) annotation: $windows\n" +
        p.take(2000))
    assert(!p.contains("CartesianProduct"),
      "bounds/spine rides broadcast nested loop, never cartesian:\n" + p.take(2000))
  }

  test("q126 k-anonymity: one aggregate — no join, no window, no sort but the output order") {
    val p = planString("q126_k_anonymity")
    assert(!p.contains("Join"), "class sizing is a bare aggregate:\n" + p.take(2000))
    assert(!p.contains("Window "), p.take(2000))
  }

  test("q127 containment: hash screen joins, rank window per-doc, no cartesian") {
    val p = planString("q127_containment")
    assert(p.contains("graft_sorted_intersect"),
      "the screen must use the native two-pointer expression:\n" + p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("id")),
      s"rank windows must partition by the doc id: $windows\n" + p.take(2000))
  }

  test("q128 LSH recall: one signature scan feeds all three band configs") {
    val p = planString("q128_lsh_recall")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the md5 signature aggregate appears once as a live subtree; the other
    // two configs must reuse it through the tracked InMemoryRelation
    val liveSigAggs = p.split("\n").count(l =>
      l.contains("partial_min") && l.contains("graft_md5h60"))
    assert(liveSigAggs <= 1,
      s"signature pass must not replay per band config ($liveSigAggs live):\n" +
        p.take(2500))
  }

  test("q137 temperature mix: keep-rates fold to literals — no join, no window") {
    val p = planString("q137_temperature_mix")
    assert(!p.contains("Join"),
      "per-source rates are a literal CASE chain, never a join:\n" + p.take(2000))
    assert(!p.contains("Window "), p.take(2000))
  }

  test("q138 semantic decon: test set broadcasts as a nested-loop, no cartesian") {
    val p = planString("q138_semantic_decon")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the θ² predicate is non-equi — the bounded test side must broadcast:\n" +
        p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      p.take(2000))
  }

  test("q139 label prop: kNN windows partition by the query id, no cartesian") {
    val p = planString("q139_label_prop")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(windows.forall(_.contains("id")),
      s"every window must be per-vector, never corpus-global: $windows")
  }

  test("q140 TV drift: ntile offsets broadcast; no cartesian on the doc grain") {
    val p = planString("q140_tv_drift")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "the distinct-value offsets table must broadcast back:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q141 ngram novelty: aggregates and one gram-key join — no window") {
    val p = planString("q141_ngram_novelty")
    assert(!p.contains("Window "),
      "first-epoch attribution is an aggregate, not a window:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q143 packing efficiency: pure aggregate — no join, no window, no sort but output") {
    val p = planString("q143_packing_efficiency")
    assert(!p.contains("Join"), "capacity audit is scan+explode+agg:\n" + p.take(2000))
    assert(!p.contains("Window "), p.take(2000))
  }

  test("q144 skew audit: key-grain aggregate + bounded top-10, no global sort") {
    val p = planString("q144_skew_audit")
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 keys must be a bounded heap:\n" + p.take(2000))
    assert(!p.contains("Window "), p.take(2000))
  }

  test("q145 simpson: two chained aggregates — no join, no window") {
    val p = planString("q145_simpson")
    assert(!p.contains("Join"), p.take(2000))
    assert(!p.contains("Window "), p.take(2000))
  }

  test("q146 rbo: rank windows per query; prefix overlaps are aggregates") {
    val p = planString("q146_rbo")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("query_id")),
      s"rank windows must partition by query: $windows")
  }

  test("q147 shard stability: assignment is a projection — no join, no window") {
    val p = planString("q147_shard_stability")
    assert(!p.contains("Join"),
      "both assignments fold to literal hash argmaxes:\n" + p.take(2000))
    assert(!p.contains("Window "), p.take(2000))
  }

  test("q148 persistent hitters: per-day rank is WindowGroupLimit-bounded") {
    val p = planString("q148_persistent_hitters")
    assert(p.contains("WindowGroupLimit"),
      "the daily top-20 must prune below the rank window:\n" + p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("q149 source jaccard: sizes broadcast back; pair work on the vocab grain") {
    val p = planString("q149_source_jaccard")
    assert(p.contains("BroadcastHashJoin"),
      "the |sources|-row size table must broadcast:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("Window "), p.take(2000))
  }

  test("q150 gini: cumulative window runs per source on the distinct grain") {
    val p = planString("q150_length_gini")
    assert(!p.contains("Join"), "closed-form Gini needs no join:\n" + p.take(2000))
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("source")),
      s"cumulative sums must partition by source: $windows")
  }

  test("q151 winnow density: selection windows are all per-document") {
    val p = planString("q151_winnow_density")
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("id")),
      s"winnow selection must partition by doc: $windows")
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q152 winnow pairs: fingerprint-bucket join only — no cartesian") {
    val p = planString("q152_winnow_pairs")
    assert(!p.contains("CartesianProduct"),
      "pairs must form on the fingerprint-hash key:\n" + p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q153 kappa: confusion rollup is windowless") {
    val p = planString("q153_gate_kappa")
    assert(!p.contains("Window "),
      "kappa is one aggregate + projection:\n" + p.take(2000))
  }

  test("q154 auc: rank-sum windows run per source on the distinct grain") {
    val p = planString("q154_length_auc")
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("source")),
      s"cumulative counts must partition by source: $windows")
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q155 ks: every cumulative window is key-partitioned (no global sort)") {
    val p = planString("q155_ks_drift")
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("__k")),
      s"pooled cum must ride the key-partitioned window: $windows")
  }

  test("q156 spearman: midranks come from key-partitioned grain windows") {
    val p = planString("q156_spearman")
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("__k")),
      s"rank windows must partition by key: $windows")
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q157 benford: windowless; the digit dimension broadcasts") {
    val p = planString("q157_benford")
    assert(!p.contains("Window "), p.take(2000))
    assert(p.contains("Broadcast"),
      "9-row digit dim must broadcast:\n" + p.take(2000))
  }

  test("q158 sweep: within-bucket cums are bucket-partitioned; carries broadcast") {
    val p = planString("q158_max_concurrency")
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(windows.exists(_.contains("__b")),
      s"the boundary-grain cum must partition by bucket: $windows")
    assert(p.contains("BroadcastHashJoin"),
      "the |buckets|-row carry table must broadcast:\n" + p.take(2000))
  }

  test("q159 salted join: shuffle join on (key, salt) — never broadcast") {
    val p = planString("q159_salted_join")
    assert(!p.contains("BroadcastHashJoin"),
      "a broadcast join would make the salt dead weight:\n" + p.take(2000))
    assert(p.contains("__salt"),
      "join keys must include the salt:\n" + p.take(2000))
  }

  test("q160 locality: jump windows are (strategy, bucket)-partitioned") {
    val p = planString("q160_hilbert_locality")
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(windows.nonEmpty &&
      windows.forall(w => w.contains("strategy") && w.contains("bucket")),
      s"jump lags must stay bucket-partitioned: $windows")
    assert(!p.contains("Join"), p.take(2000))
  }

  test("q161 calibration: no corpus-grain global sort (distinct-grain ntile)") {
    val p = planString("q161_gate_calibration")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // groupedNtile plans its tile from the distinct-length histogram —
    // the raw doc stream must not pass through a global Sort+Window ntile
    assert(!p.contains("ntile"), "must not use a global ntile window:\n" + p.take(2000))
  }

  test("q164 percentile: midrank windows stay source-partitioned") {
    val p = planString("q164_percentile_normalize")
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("source")),
      s"midrank windows must partition by source: $windows")
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q165 zipf: joinless; cumulative runs on the freq-of-freq grain") {
    val p = planString("q165_zipf_segments")
    assert(!p.contains("Join"),
      "segmentation is aggregates + one tiny window:\n" + p.take(2000))
    // two shuffles to grains (term, then freq-of-freq) before the window
    assert(p.contains("Window"), p.take(2000))
  }

  test("HITS score join is size-gated: broadcast under the gate, shuffle join past it") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // the production half-iteration expression, both strategies — the
    // score side is fact-grain (hubs = orders) at scale, so an ungated
    // broadcast would grow linearly with the fact table
    val ed = Seq((1L, 10L), (2L, 10L), (2L, 11L)).toDF("h", "a")
    val scores = ed.select($"a".as("node")).distinct()
      .withColumn("score", lit(1L << 20))
    val pb = graft.operators.Hits.rawSums(ed, scores, "a", "h", bcast = true)
      .queryExecution.executedPlan.toString
    assert(pb.contains("BroadcastHashJoin"),
      "gated-small path must broadcast the scores:\n" + pb.take(2000))
    // at scale the score table's stats exceed the auto-broadcast threshold
    // too; emulate that on the tiny fixture by disabling the auto threshold
    // so only the (absent) hint could broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pc = graft.operators.Hits
        .rawSums(ed.repartition($"a"), scores, "a", "h", bcast = false)
        .queryExecution.executedPlan.toString
      assert(!pc.contains("BroadcastHashJoin"),
        "past the gate the scores must NOT broadcast (co-partitioned join):\n" +
          pc.take(2000))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("q252 calibration: strengths broadcast onto the judgment scan, bucket agg partial") {
    // the judgment table is the 100 TB object; the fitted strengths table
    // is |items|-bounded and explicitly broadcast (twice: lo and hi side),
    // and the 10-key bucket rollup must combine map-side before its
    // exchange — a plain shuffle of per-judgment rows to 10 keys is the
    // classic skew bomb
    val p = planString("q252_pref_calibration")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "lo+hi strength lookups must both broadcast:\n" + p.take(2000))
    assert(p.contains("partial_count") && p.contains("partial_sum"),
      "bucket rollup must partial-aggregate map-side:\n" + p.take(2000))
  }

  test("q251 audit: the bounded pair-majority table broadcasts back onto judgments") {
    val p = planString("q251_annotator_audit")
    assert(p.contains("BroadcastHashJoin"),
      "majority table must broadcast:\n" + p.take(2000))
    assert(p.contains("partial_count"),
      "annotator rollup must partial-aggregate:\n" + p.take(2000))
  }
}
