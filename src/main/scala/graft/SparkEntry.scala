package graft

import graft.operators.{AsofJoin, Calibration, Coreset, Dedup, Effective, GoldenRecord, Rollups, Similarity, StatePropagation, Windows}
import graft.functions.{PortableHash, SimilarityFunctions => SF, TextFunctions => TF}
import graft.sources.PipeSeries
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — queries exercising every implemented operator from
  * SURVEY.md §2 over the driver's synthetic tables (TESTDATA.md), each with a
  * DuckDB oracle where SQL-expressible.
  *
  * Float determinism policy (oracle hash-parity AND reproducibility at
  * scale): double sums are taken through DecimalType (order-independent,
  * exact) and cast back to double at the end; ratios are plain IEEE double
  * divisions of exact values (identical in both engines); round() is avoided
  * entirely (Spark's round(double) goes through the shortest-repr BigDecimal
  * and can differ from DuckDB's by 1 ulp at boundaries).
  */
object SparkEntry {
  import Tables._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    regionRevenue(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  /** A1/A2/A3: conditional-count pivot ("sentiment histogram" shape, cf.
    * reference sql/article_daily_counts_mv.sql:11-17) on lineitem flags. */
  private def pricingPivot(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Rollups.exactMoneySum(col("l_quantity"), 0).as("sum_qty"),
        Rollups.exactMoneySum(col("l_extendedprice")).as("sum_base_price"),
        Rollups.exactDiscountedSum(col("l_extendedprice"), col("l_discount"))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        Rollups.countIf(col("l_discount") > 0.05).as("high_discount_count"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** J1: fact→dim join chain with broadcast dims (cf. reference MV joins,
    * sql/serp_daily_counts_mv.sql:16-17). Dims are roster-scale → broadcast;
    * the only shuffle is the final group-by on 5 region keys. */
  private def regionRevenue(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      // two-level aggregate instead of countDistinct: level 1 groups by
      // (region, order) with map-side combine — partial scaled-long revenue
      // sums — level 2 folds to regions where count(*) IS the distinct
      // order count. Same bit-exact result, no distinct expand.
      .groupBy(col("r_name"), col("o_orderkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("__part"))
      .groupBy(col("r_name"))
      .agg((sum(col("__part")).cast("double") / 10000.0).as("revenue"),
        count(lit(1)).as("order_cnt"))
      .orderBy("r_name")

  /** P1+J2+J3: latest-wins dedup + broadcast left join + coalesce chain (the
    * reference's single most load-bearing semantic — effective labels). */
  private def effectiveStatus(s: SparkSession, dir: String): DataFrame = {
    val latest = Effective.latestWins(
      orders(s, dir).select(col("o_custkey"), col("o_orderstatus"),
        col("o_orderdate"), col("o_orderkey")),
      Seq("o_custkey"),
      Seq(col("o_orderdate").desc, col("o_orderkey").desc))
      .select(col("o_custkey"), col("o_orderstatus").as("latest_status"))
    Effective.withEffective(
      customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
        .withColumn("o_custkey", col("c_custkey")),
      latest,
      Seq("o_custkey"),
      Map("eff_status" -> Seq(col("latest_status"), col("c_mktsegment"))))
      .select(col("c_custkey"), col("c_mktsegment"), col("latest_status"), col("eff_status"))
      .orderBy("c_custkey")
  }

  /** J4/O5: tagged-union daily metrics — one shuffle instead of the
    * reference's union-of-keys + 5 left joins (sql/entity_daily_metrics_v.sql). */
  private def unionDaily(s: SparkSession, dir: String): DataFrame =
    Rollups.taggedUnionCounts(
      Seq(
        "orders" -> orders(s, dir).select(to_date(col("o_orderdate")).as("d")),
        "ship" -> lineitem(s, dir).select(to_date(col("l_shipdate")).as("d"))),
      Seq("d"))
      .orderBy("d")

  private def eventsDaily(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"), eventDay(col("ts")).as("d"))
      .agg(
        sum(col("value").cast("decimal(18,2)")).as("v"),
        count(lit(1)).as("n"))

  /** W1: trailing-7-observations window over per-user daily series (ROWS
    * frame — "last 7 observations", sql/entity_weekly_rollup_v.sql:2-29). */
  private def trailing7(s: SparkSession, dir: String): DataFrame = {
    val w = Windows.trailing(Seq("user_id"), "d", 7)
    eventsDaily(s, dir)
      .select(col("user_id"), col("d"),
        sum(col("n")).over(w).as("n7"),
        sum(col("v")).over(w).cast("double").as("v7"),
        min(col("d")).over(w).as("win_start"))
      .orderBy("user_id", "d")
  }

  /** W2+O6: 30-prior-rows baseline + anomaly gate (≥7 prior observation days,
    * count ≥ 2× baseline — sql/entity_anomalies_v.sql:4-23,58-61). */
  private def anomalyBaseline(s: SparkSession, dir: String): DataFrame = {
    val w = Windows.priorFrame(Seq("user_id"), "d", 30, 1)
    eventsDaily(s, dir)
      .select(col("user_id"), col("d"), col("n"),
        count(lit(1)).over(w).as("prior_days"),
        sum(col("n")).over(w).as("prior_total"))
      .filter(col("prior_days") >= 7)
      .withColumn("baseline", col("prior_total").cast("double") / col("prior_days"))
      .filter(col("n") >= lit(2.0) * col("baseline"))
      .select("user_id", "d", "n", "prior_days", "baseline")
      .orderBy("user_id", "d")
  }

  /** W7: gaps-and-islands consecutive-day episodes (reference computes this
    * in a Python loop, dashboard_app/app.py:1602-1635). */
  private def gapsIslands(s: SparkSession, dir: String): DataFrame =
    Windows.episodes(
      events(s, dir).select(col("user_id"), eventDay(col("ts")).as("d")),
      Seq("user_id"), "d")
      .select(col("user_id"), col("episode_start"), col("episode_end"), col("episode_days"))
      .orderBy("user_id", "episode_start")

  /** W6/A10: distinct-on latest-row dedup per (user, event_type). */
  private def latestDedup(s: SparkSession, dir: String): DataFrame =
    Effective.latestWins(events(s, dir), Seq("user_id", "event_type"),
      Seq(col("ts").desc, col("event_id").desc))
      .select(col("user_id"), col("event_type"), col("event_id"),
        eventDay(col("ts")).as("d"), col("value"))
      .orderBy("user_id", "event_type")

  /** A4: top-3 alphabetically-first matching strings per group
    * (sql/negative_summary_mv.sql:43-46 shape). */
  private def top3Names(s: SparkSession, dir: String): DataFrame =
    part(s, dir)
      .groupBy(col("p_brand"))
      .agg(
        Rollups.topKStringsAgg(col("p_name"), col("p_size") > 25, 3).as("top_names"),
        Rollups.countIf(col("p_size") > 25).as("n_large"))
      .filter(col("n_large") > 0)
      .orderBy("p_brand")

  /** A6: screen/rank aggregate with HAVING + top-k (app.py:4400-4426). */
  private def screenTopSpenders(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(
        Rollups.exactMoneySum(col("o_totalprice")).as("total_spend"),
        // max needs no decimal detour: the doubles are exact 2-dec values
        max(col("o_totalprice")).as("peak_order"),
        Rollups.countIf(col("o_totalprice") > 150000).as("big_orders"),
        count(lit(1)).as("n_orders"))
      .filter(col("total_spend") >= 100000)
      .orderBy(col("total_spend").desc, col("o_custkey"))
      .limit(20)

  /** A12: exact median per group (Python statistics.median parity —
    * app.py:2168; exact, never approx). Served by the two-pass
    * count+offset selection kernel (Profiling.exactMedianByKey): at corpus
    * scale a hot group's values no longer buffer in one percentile
    * aggregation buffer — bit-identical to exact percentile (pinned in
    * ProfilingSpec). */
  private def medianPrice(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .join(
        graft.operators.Profiling.exactMedianByKey(
          orders(s, dir), "o_orderpriority", "o_totalprice")
          .withColumnRenamed("median", "median_price"),
        Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("median_price"), col("n"))
      .orderBy("o_orderpriority")

  /** P9/O2: pagination via row_number window (offset 100, page 50). */
  private def pagination(s: SparkSession, dir: String): DataFrame =
    Windows.paginate(
      orders(s, dir).select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"),
        col("o_totalprice")),
      Seq(col("o_orderdate"), col("o_orderkey")), 100, 50)
      .withColumn("rn", col("rn").cast("long"))
      .orderBy("rn")

  /** Text analysis: token counts + chars-per-token quality component. */
  private def tokenStats(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), col("lang"),
        TF.charCount(col("text")).as("n_chars2"),
        TF.tokenCount(col("text")).as("n_tokens"))
      .withColumn("chars_per_token", col("n_chars2").cast("double") / col("n_tokens"))
      .orderBy("doc_id")

  /** Exact dedup: content-fingerprint groups (md5 of normalized text). */
  private def docFingerprint(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(documents(s, dir), "doc_id", "text")
      .select(col("fp"), col("n_docs"), col("keep_id"))
      .orderBy("fp")

  /** Incremental EXACT dedup: the batch (doc_id % 10 == 0) collapsed to
    * fingerprint groups and anti-joined against the corpus fingerprint
    * store — only first-ever-seen content survives; the store is never
    * recomputed. Exact-dedup twin of q60. */
  private def incrementalExactQ(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    graft.operators.Dedup.incrementalExactNew(
      docs.filter(col("doc_id") % 10 === 0),
      graft.operators.Dedup.exactGroups(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text").select("fp"),
      "doc_id", "text")
      .orderBy("fp")
  }

  /** Token capacity planning: BPE-pretokenizer counts (the tokens a merge
    * stage will see) next to whitespace counts — punctuation- and
    * digit-heavy text undercounts badly under whitespace splitting. */
  private def bpeTokensQ(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(col("doc_id"),
      TF.tokenCount(col("text")).as("ws_tokens"),
      TF.bpeTokenCount(col("text")).as("bpe_tokens"))
      .withColumn("ratio",
        col("bpe_tokens").cast("double") / col("ws_tokens"))
      .orderBy("doc_id")

  /** Language-ID heuristic: standalone-stopword hit counts per language,
    * arg-max label (first-listed wins ties). */
  private val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "und", "die"))

  private def langId(s: SparkSession, dir: String): DataFrame = {
    val scored = langStopwords.foldLeft(documents(s, dir)) { case (df, (l, ws)) =>
      df.withColumn(s"${l}_hits", TF.stopwordHits(col("text"), ws))
    }
    scored
      .withColumn("predicted_lang",
        TF.argMaxLang(langStopwords.map { case (l, _) => l -> col(s"${l}_hits") }))
      .select(col("doc_id"), col("lang"), col("en_hits"), col("es_hits"),
        col("de_hits"), col("predicted_lang"))
      .orderBy("doc_id")
  }

  /** ANN baseline: brute-force cosine top-5 for the first 10 vectors.
    * Oracled against DuckDB `list_cosine_similarity` ranking: the score
    * itself is excluded from the output (DuckDB computes FLOAT[] cosine in
    * float, ours accumulates in double — ~1e-7 apart) but the RANKINGS agree
    * bit-for-bit because the minimum adjacent-neighbor gap in this data is
    * ~2e-5, 200x the float error (measured at sf0.01 and sf0.1). */
  private def cosineKnn(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** IVF-bucketed ANN (scale path). Fully deterministic given the centroid
    * rule (first nlist vectors by id), so the oracle replays the same
    * assignment/probe/rank pipeline in SQL; margins (min best-vs-second
    * centroid gap ~1e-5) dwarf the float-vs-double cosine difference. */
  private def cosineIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    val cents = Similarity.headCentroids(emb, "vec_id", "embedding", 16)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
      5, centroids = cents, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** int8-quantized ANN: quantize the corpus (portable floor(x*s+0.5)
    * formula), brute-force cosine top-k over the quantized vectors. All dot
    * products are exact small-integer sums until the final division, so the
    * oracle's ranks match bit-for-bit. */
  private def quantizedKnn(s: SparkSession, dir: String): DataFrame = {
    val q = Similarity.quantizeInt8(embeddings(s, dir), "vec_id", "embedding")
    Similarity.bruteForceTopKQuantized(q, q.filter(col("vec_id") < 10), "vec_id", 5)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }

  private val stratifiedRates =
    Map("en" -> 0.5, "de" -> 0.25, "es" -> 0.1)

  /** Deterministic stratified sampling: per-language keep rates resolved to
    * integer ppm thresholds over md5Hash60(doc_id) — reproducible,
    * partition-independent, engine-replayable (pure pushdown filter). */
  private def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratifiedSample(
      documents(s, dir).select(col("doc_id"), col("lang")),
      "doc_id", "lang", stratifiedRates)
      .orderBy("doc_id")

  /** Deterministic token-weighted sample: 50 docs, inclusion odds rising
    * with token count (integer-exact priority, no pow/ln). */
  private def weightedSampleQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.weightedSample(
      documents(s, dir)
        .select(col("doc_id"), TF.tokenCount(col("text")).as("w")),
      "doc_id", "w", 50)
      .orderBy("priority", "doc_id")

  /** Training-data chunking: 64-token windows, 16-token overlap — pure
    * explode, no shuffle (chunks inherit scan partitioning). */
  private def chunkDocs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunking.chunkByTokens(documents(s, dir), "doc_id", "text",
      chunkSize = 64, overlap = 16)
      .orderBy("doc_id", "chunk_idx")

  /** Sequence packing: per-language streaming bin assignment under a
    * 2048-token budget (cumulative-sum window; the pack key bounds the
    * window so no global sort exists). */
  private def packDocs(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir).select(col("doc_id"), col("lang"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    graft.operators.Chunking.packSequences(d, Seq("lang"), "doc_id", "n_tokens", 2048L)
      .orderBy("lang", "doc_id")
  }

  /** MinHash+LSH near-dup candidates — portable md5Hash60/affine31 hash
    * family so the WHOLE signature → band → bucket → pair pipeline replays
    * bit-for-bit in the DuckDB oracle. */
  private def minhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidatePairs(documents(s, dir), "doc_id", "text",
      shingleSize = 2, numHashes = 32, rowsPerBand = 8, portable = true)
      .orderBy("id_a", "id_b")

  /** Incremental dedup: the corpus signature store (doc_id % 10 != 0,
    * [[graft.operators.Dedup.minhashBandTable]]) probed by a new batch
    * (doc_id % 10 == 0) — only new-sided pairs, harvested from only the
    * buckets the batch touches; the store is never re-hashed. Same portable
    * hash family/params as q18, so the oracle replays the full pipeline and
    * filters to batch-sided pairs. */
  private def incrementalDedupQ(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    def band(df: DataFrame) = Dedup.minhashBandTable(df, "doc_id", "text",
      shingleSize = 2, numHashes = 32, rowsPerBand = 8, portable = true)
    Dedup.minhashIncrementalPairs(
      band(docs.filter(col("doc_id") % 10 === 0)),
      band(docs.filter(col("doc_id") % 10 =!= 0)),
      numHashes = 32, maxBucket = 1000)
      .orderBy("id_a", "id_b")
  }

  /** Benchmark decontamination: corpus docs sharing >= 50% of a test item's
    * distinct word trigrams (test set = every 101st doc). The corpus n-gram
    * stream is pruned against the broadcast test vocabulary BEFORE the only
    * shuffle — the BM25 vocabulary-prune posture. */
  private def contaminationQ(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    val testSet = docs.filter(col("doc_id") % 101 === 0)
      .select(col("doc_id").as("test_id"), col("text"))
    graft.operators.Decontamination.contaminationReport(
      docs, "doc_id", "text", testSet, "test_id", "text", n = 3, minOverlapFrac = 0.5)
      .orderBy("doc_id", "test_id")
  }

  /** PII scrub report: deterministic synthetic identifiers (email, phone,
    * IPv4) injected into every 7th document, then detected and redacted by
    * the RE2-compatible TextScrub battery — counts, scrubbed length, and a
    * fingerprint of the scrubbed text, all engine-replayable. */
  private def piiScrubQ(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextScrub
    val synth = when(col("doc_id") % 7 === 0,
      concat(col("text"),
        lit(" contact agent"), col("doc_id").cast("string"),
        lit("@corp.example.com call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit("."),
        (col("doc_id") % 100).cast("string"))).otherwise(col("text"))
    documents(s, dir).select(col("doc_id"), synth.as("__t"))
      .select(col("doc_id"),
        TextScrub.emailCount(col("__t")).cast("long").as("n_emails"),
        TextScrub.phoneCount(col("__t")).cast("long").as("n_phones"),
        TextScrub.ipv4Count(col("__t")).cast("long").as("n_ips"),
        length(TextScrub.scrub(col("__t"))).cast("long").as("clean_len"),
        md5(TextScrub.scrub(col("__t")).cast("binary")).as("clean_fp"))
      .orderBy("doc_id")
  }

  /** Quality gating at an EXACT per-group percentile: per-language p25 of
    * document length from the two-pass selection kernel
    * (Profiling.exactQuantilesByKey — no value buffering), then keep docs
    * at or above their language's threshold. The R-7 interpolation matches
    * DuckDB quantile_cont bit-for-bit. */
  private def qualityGateQ(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
      .select(col("doc_id"), col("lang"), length(col("text")).cast("long").as("n_chars"))
    val th = graft.operators.Profiling.exactQuantilesByKey(d, "lang", "n_chars", Seq(0.25))
      .select(col("lang"), col("value").as("p25"))
    d.join(broadcast(th), "lang")
      .filter(col("n_chars") >= col("p25"))
      .groupBy("lang")
      .agg(first(col("p25")).as("p25"),
        count(lit(1)).as("n_kept"),
        min(col("n_chars")).as("min_kept"))
      .orderBy("lang")
  }

  /** Training-mix rebalancing: uniform per-source token budget (half the
    * corpus), integer ppm keep-rates, deterministic md5 sampling — the
    * domain-mixing pass of a pretraining pipeline. All rate arithmetic is
    * integer floor division, replayed verbatim by the oracle. */
  private def domainMixQ(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir).select(col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val budget = d.agg(sum(col("n_tokens"))).collect()(0).getLong(0) / 2L
    graft.operators.Mixing.mixUniform(d, "doc_id", "source", "n_tokens", budget)
      .groupBy("source", "rate_ppm")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy("source")
  }

  /** SimHash fingerprints + prefix-block buckets (portable 60-bit family —
    * oracle recomputes the same balances/assembly in SQL). */
  private def simhashTable(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashTable(documents(s, dir), "doc_id", "text", portable = true)
      .orderBy("id")

  /** Dedup GROUPS from LSH candidate pairs: connected components (min-label
    * propagation) over the q18 pair graph — the keep/drop decision step of
    * a corpus dedup pipeline. Oracled against a recursive-CTE reachability
    * query over the same pairs. */
  private def dedupGroups(s: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(
      // persist the LSH pair graph: CC's per-round actions would otherwise
      // re-run the whole signature pipeline. Tracked in the bounded cache
      // registry (Caching) — same policy as the Insights/Storylines bases.
      graft.Caching.track(
        Dedup.minhashCandidatePairs(documents(s, dir), "doc_id", "text",
          shingleSize = 2, numHashes = 32, rowsPerBand = 8, portable = true)))
      .orderBy("id")

  /** SimHash near-dup PAIRS via 4 rotated prefix-block tables — complete for
    * Hamming <= 3 by pigeonhole, so the oracle can be the brute-force
    * `bit_count(xor)` join (a completeness proof, not just a replay). */
  private def simhashPairsQ(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(
      Dedup.simhashTable(documents(s, dir), "doc_id", "text", portable = true),
      bits = 60)
      .orderBy("id_a", "id_b")

  /** As-of (point-in-time) join: each purchase event matched to the SAME
    * user's latest at-or-before click — the trades→quotes shape. Single
    * key-shuffle union-sort plan (no range explosion); oracled against
    * DuckDB's native ASOF LEFT JOIN. Timestamps emitted as epoch micros
    * (exact decimal ns→us floor on the Spark side == DuckDB's ns→us read). */
  private def asofJoinQ(s: SparkSession, dir: String): DataFrame = {
    def us(c: Column): Column =
      floor(c.cast("decimal(20,0)") / lit(1000)).cast("long")
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
        col("ts").as("click_ts"), col("value").as("click_value"))
    AsofJoin.asofBackward(purchases, clicks, Seq("user_id"), "ts", "ts",
      Seq("click_id", "click_ts", "click_value"))
      .select(col("event_id"), col("user_id"), us(col("ts")).as("ts_us"),
        col("click_id"), us(col("click_ts")).as("click_ts_us"), col("click_value"))
      .orderBy("event_id")
  }

  /** Forward as-of (q84): time-to-next-error after each purchase — the
    * incident-attribution twin of q52's backward join, exercising the
    * operator's reverse-timeline scan. Same single-shuffle union-sort
    * plan; DuckDB ASOF with `<=` is the oracle. */
  private def asofForwardQ(s: SparkSession, dir: String): DataFrame = {
    def us(c: Column): Column =
      floor(c.cast("decimal(20,0)") / lit(1000)).cast("long")
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id").as("err_id"),
        col("ts").as("err_ts"))
    AsofJoin.asofForward(purchases, errors, Seq("user_id"), "ts", "ts",
      Seq("err_id", "err_ts"))
      .select(col("event_id"), col("user_id"), us(col("ts")).as("ts_us"),
        col("err_id"), us(col("err_ts")).as("err_ts_us"),
        (us(col("err_ts")) - us(col("ts"))).as("us_to_error"))
      .orderBy("event_id")
  }

  /** Binned range join: per-user error EPISODES (gaps-and-islands intervals,
    * the q07 kernel over error days) joined to the purchase events that fall
    * inside them — a composed interval-attribution pipeline. Day ordinates
    * (exact integers) keep the bin arithmetic engine-portable; the oracle is
    * the same episode CTE plus a plain inequality join. */
  private def rangeJoinQ(s: SparkSession, dir: String): DataFrame = {
    def dayNum(c: Column): Column = datediff(c, lit("1970-01-01")).cast("long")
    val ev = events(s, dir)
    val errorDays = ev.filter(col("event_type") === "error")
      .select(col("user_id"), eventDay(col("ts")).as("d"))
    val episodes = Windows.episodes(errorDays, Seq("user_id"), "d")
      .select(col("user_id"), dayNum(col("episode_start")).as("ep_start"),
        dayNum(col("episode_end")).as("ep_end"), col("episode_days"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), dayNum(eventDay(col("ts"))).as("p_day"))
    graft.operators.RangeJoin.pointsInIntervals(purchases, episodes,
      Seq("user_id"), "p_day", "ep_start", "ep_end", binWidth = 4L)
      .select(col("user_id"), col("event_id"), col("p_day"),
        col("ep_start"), col("ep_end"), col("episode_days"))
      .orderBy("user_id", "event_id", "ep_start")
  }

  /** Sessionization over the event stream: Spark's native `session_window`
    * (6-hour inactivity gap — the median per-user inter-event gap here is
    * ~7h, so real splits occur) with per-session stats and a 1-based
    * session index. Same-session iff gap < 6h (session_window merges
    * overlapping [ts, ts+gap) windows), which the oracle replays as a
    * lag + cumulative-sum islands build with a `>= gap` split in micros.
    * Batch twin of the streaming state machinery in graft.streaming. */
  private def sessionizeQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .select(col("user_id"), eventTs(col("ts")).as("t"), col("event_type"))
    val sess = ev
      .groupBy(col("user_id"), session_window(col("t"), "6 hours").as("w"))
      .agg(min(col("t")).as("s"), max(col("t")).as("e"),
        count(lit(1)).as("n_events"),
        Rollups.countIf(col("event_type") === "purchase").as("n_purchases"))
    sess
      .select(col("user_id"),
        unix_micros(col("s")).as("session_start_us"),
        unix_micros(col("e")).as("session_end_us"),
        col("n_events"), col("n_purchases"))
      .withColumn("session_idx", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("session_start_us")))
        .cast("long"))
      .orderBy("user_id", "session_idx")
  }

  /** SCD2 interval build: each user's event_type stream as a change log —
    * consecutive duplicates collapse, every change opens a validity interval
    * closed (exclusively) by the next change; the open interval is
    * `is_current`. One shuffle + one sort shared by both window passes. */
  private def scd2Q(s: SparkSession, dir: String): DataFrame = {
    def us(c: Column): Column =
      floor(c.cast("decimal(20,0)") / lit(1000)).cast("long")
    val changes = events(s, dir)
      .select(col("user_id"), us(col("ts")).as("t"), col("event_type").as("status"))
    graft.operators.Scd2.buildIntervals(changes, Seq("user_id"), "t", Seq("status"))
      .select(col("user_id"), col("status"),
        col("valid_from").as("valid_from_us"), col("valid_to").as("valid_to_us"),
        col("is_current"))
      .orderBy("user_id", "valid_from_us")
  }

  private val bm25Queries = Seq(
    (1, Seq("hash", "join")),
    (2, Seq("window", "agg")),
    (3, Seq("slow", "scan", "filter")))

  /** BM25 keyword search: top-10 docs per query, rank-oracled (scores sum
    * through decimal(38,12) — order-independent, so ranks replay exactly;
    * the floats themselves stay out of the compare surface). */
  private def bm25Q(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextSearch.bm25TopK(documents(s, dir), "doc_id", "text",
      bm25Queries, k = 10)
      .orderBy("query_id", "rank")

  private val profileCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Multi-column numeric profile of lineitem — EXACT cardinalities and
    * medians, scale-safely: one melted map-side-combined shuffle to the
    * distinct-value grain, n/n_null/n_distinct/min/max off that grain (no
    * Expand), medians by iterative bucket refinement (two-pass
    * count+offset selection — no value-buffering percentile anywhere). */
  private def profileQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.profileNumeric(lineitem(s, dir), profileCols)
      .orderBy("col_name")

  /** Tokenizer vocabulary: term counts with a min-count floor, bounded
    * top-k, deterministic (count desc, term) ids. */
  private def vocabQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextSearch.buildVocab(documents(s, dir), "text",
      minCount = 5L, maxVocab = 100)
      .orderBy("vocab_id")

  /** Per-doc keyword extraction: top-3 terms by exact tf/df (rank-order
    * core of tf-idf; ln-free for cross-engine bit parity). */
  private def keywordsQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextSearch.keywordsTopK(documents(s, dir), "doc_id", "text", 3)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id", "rank")

  /** Deterministic epoch-3 shard audit: per-shard doc/token counts and the
    * shard's first doc (pins the whole permutation — any assignment or
    * ordering drift moves some shard's head). */
  private def epochShardsQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sharding.assignShards(
      documents(s, dir).select(col("doc_id"), col("text")), "doc_id",
      epoch = 3, numShards = 8)
      .withColumn("t", TF.tokenCount(col("text")))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("t")).as("n_tokens"),
        min(when(col("shard_pos") === 1, col("doc_id"))).as("first_doc"))
      .orderBy("shard")

  /** Tokenizer apply: encode every doc against the q58 vocabulary —
    * order-preserving token→id with OOV→0, ids as CSV for cross-engine
    * byte-comparability. */
  private def tokenIdsQ(s: SparkSession, dir: String): DataFrame = {
    val vocab = graft.operators.TextSearch.buildVocab(documents(s, dir), "text",
      minCount = 5L, maxVocab = 100)
    graft.operators.TextSearch.encodeWithVocab(documents(s, dir), "doc_id", "text", vocab)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** Length-bucketed batching: per-batch padding-waste audit. Batch 0
    * holds the 32 longest docs, each batch pads to its own max. */
  private def lengthBatchesQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Batching.lengthBatches(
      documents(s, dir).select(col("doc_id"), TF.tokenCount(col("text")).as("len")),
      "doc_id", "len", batchSize = 32)
      .groupBy("batch")
      .agg(
        count(lit(1)).as("n_docs"),
        max(col("len")).as("max_len"),
        sum(col("len")).as("sum_len"))
      .withColumn("pad_waste", col("n_docs") * col("max_len") - col("sum_len"))
      .orderBy("batch")

  /** W11/K5: recursive prev-day active-state propagation via flatMapGroups —
    * the reference's crisis-event trigger machine shape
    * (crisis_event_rollups.py:541-561). The DuckDB oracle uses the
    * closed-form (running max of `start` within continue-segments of
    * consecutive-day islands) — a differential test of the sequential kernel. */
  private def activePropagation(s: SparkSession, dir: String): DataFrame = {
    val flagged = eventsDaily(s, dir)
      .withColumn("start_f", col("n") >= 5)
      .withColumn("cont_f", col("n") >= 3)
      .select("user_id", "d", "n", "start_f", "cont_f")
    StatePropagation.propagateActive(flagged, Seq("user_id"), "d", "start_f", "cont_f")
      .select(col("user_id"), col("d"), col("n"), col("active"))
      .orderBy("user_id", "d")
  }

  /** W8: trailing streak of qualifying observations ending at the latest row
    * (reference walks rows reversed while metric >= threshold,
    * app.py:1380-1387). */
  private def trailingStreak(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("d").desc)
    eventsDaily(s, dir)
      .withColumn("rn", row_number().over(w))
      .groupBy("user_id")
      .agg(coalesce(min(when(col("n") < 3, col("rn"))) - 1, count(lit(1)))
        .as("streak_days"))
      .orderBy("user_id")
  }

  /** W10: prior-calendar-day lookup (reference indexes metrics[date-1],
    * crisis_event_rollups.py:647-661). A bare lag() over sparse rows would
    * be WRONG (it fetches the previous EXISTING row, any gap away) — but
    * lag() + an exact `prev == date-1` filter is equivalent to the date-1
    * self-join while aggregating the daily table ONCE (the join shape
    * recomputes the whole scan->aggregate subplan for each side). */
  private def lagDelta(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("d")
    eventsDaily(s, dir).select("user_id", "d", "n")
      .withColumn("__pd", lag(col("d"), 1).over(w))
      .withColumn("prior_n", lag(col("n"), 1).over(w))
      .filter(col("__pd") === date_sub(col("d"), 1))
      .select(col("user_id"), col("d"), col("n"), col("prior_n"),
        (col("n") - col("prior_n")).as("delta"),
        (col("n").cast("double") / col("prior_n")).as("ratio"))
      .orderBy("user_id", "d")
  }

  /** W9: 7-day-anchored rolling windows stepping back from each user's
    * latest date (app.py:1390-1440). */
  private def anchoredWeekly(s: SparkSession, dir: String): DataFrame = {
    val daily = eventsDaily(s, dir).select("user_id", "d", "n")
    val anchors = daily.groupBy("user_id").agg(max(col("d")).as("l"))
      .withColumn("k", explode(sequence(lit(0), lit(3))))
      .select(col("user_id"), date_sub(col("l"), col("k") * 7).as("anchor"))
    anchors.join(daily.withColumnRenamed("user_id", "u2"),
        col("u2") === col("user_id") &&
          col("d").between(date_sub(col("anchor"), 6), col("anchor")),
        "left")
      .groupBy("user_id", "anchor")
      .agg(coalesce(sum(col("n")), lit(0L)).as("n7"))
      .orderBy("user_id", "anchor")
  }

  /** S5/S6: pipe-delimited parallel series — build per-user history strings,
    * then explode them back with split+arrays_zip+explode and compute the
    * snapshot daily-change fallback (src/ingest_metrics.py:97-179). */
  private def pipeSeries(s: SparkSession, dir: String): DataFrame = {
    val daily = eventsDaily(s, dir)
    val series = daily.groupBy("user_id").agg(
      array_join(transform(array_sort(collect_list(struct(col("d"), col("v")))),
        x => x.getField("v").cast("string")), "|").as("vh"),
      array_join(transform(array_sort(collect_list(struct(col("d"), col("v")))),
        x => x.getField("d").cast("string")), "|").as("dh"))
    val (dailyPct, _) = PipeSeries.snapshotChanges(col("vh"))
    val withPct = series.withColumn("daily_change_pct", dailyPct)
    PipeSeries.explodeSeries(withPct, Seq("user_id", "daily_change_pct"), "vh", "dh")
      .select(col("user_id"), col("date").cast("date").as("d"),
        col("value").cast("double").as("v"), col("daily_change_pct"))
      .orderBy("user_id", "d")
  }

  /** P4/J7: scope restriction as a semi-join (row-level security shape,
    * app.py:701-736 / sql/rls.sql). */
  private def semiJoinScope(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .join(customer(s, dir).filter(col("c_acctbal") > 5000),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        Rollups.exactMoneySum(col("o_totalprice")).as("total"))
      .orderBy("o_orderstatus")

  /** A7: sector-baseline aggregate + rank/percent_rank within peer group
    * (app.py:4543-4637: mean/median of window values, rank of a peer). */
  private def sectorBaseline(s: SparkSession, dir: String): DataFrame = {
    val byNation = customer(s, dir)
      .join(broadcast(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "n_regionkey")
      .agg(
        count(lit(1)).as("n_custs"),
        Rollups.exactMoneySum(col("c_acctbal")).as("total_bal"),
        percentile(col("c_acctbal"), lit(0.5)).as("median_bal"))
    val w = Window.partitionBy("n_regionkey").orderBy(col("total_bal").desc, col("n_name"))
    byNation
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .orderBy("n_regionkey", "rnk")
  }

  /** A5: index re-rollup — second-level aggregation over a pre-aggregated
    * daily gold table, dropping the entity dimension (app.py:3128-3139). */
  private def indexRollup(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"), eventDay(col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("d", "event_type")
      .agg(sum(col("cnt")).as("cnt"), count(lit(1)).as("active_users"))
      .orderBy("d", "event_type")

  /** O3/O4: top-k with composite tie-breaks (score desc, casefolded name asc
    * — app.py:5022-5028). */
  private def topkComposite(s: SparkSession, dir: String): DataFrame =
    part(s, dir)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(col("p_retailprice").desc, lower(col("p_name")), col("p_partkey"))
      .limit(10)

  /** K1/K3: narrative classification + entity-day rollup over documents
    * (sentiment/finance flags synthesized deterministically from doc_id;
    * grouped by source). Kernel parity is covered by differential goldens in
    * KernelsSpec; rows-only check here. */
  private def narrativeRollup(s: SparkSession, dir: String): DataFrame = {
    val items = documents(s, dir)
      .withColumn("title", col("text"))
      .withColumn("snippet", lit(""))
      .withColumn("url", lit(""))
      .withColumn("sentiment",
        when(col("doc_id") % 3 === 0, "negative")
          .when(col("doc_id") % 3 === 1, "neutral").otherwise("positive"))
      .withColumn("finance_routine", col("doc_id") % 7 === 0)
    // tags (array) / tag_counts (map) -> JSON strings: the driver's compare
    // sorts rows by every column in pandas, which cannot hash lists
    graft.operators.NarrativeRollup.rollupEntityDay(items, Seq("source"))
      .withColumn("tags", to_json(col("tags")))
      .withColumn("tag_counts", to_json(col("tag_counts")))
      .orderBy("source")
  }

  /** K11/K12: control + finance-routine classification over synthesized URLs
    * (rows-only; kernel parity via reference goldens in KernelsSpec). */
  private def controlClassify(s: SparkSession, dir: String): DataFrame = {
    val classifyUdf = udf((company: String, url: String, websites: String) =>
      graft.functions.RiskRules.classifyControl(company, url,
        graft.functions.RiskRules.parseCompanyDomains(websites)))
    val financeUdf = udf((title: String, url: String) =>
      graft.functions.RiskRules.isFinancialRoutine(title, "", url, ""))
    documents(s, dir)
      .withColumn("url",
        when(col("doc_id") % 2 === 0,
          concat(lit("https://www."), col("source"), lit(".com/page/"), col("doc_id")))
          .otherwise(concat(lit("https://news.example.com/a/"), col("doc_id"))))
      .withColumn("controlled", classifyUdf(col("source"), col("url"),
        concat(col("source"), lit(".com"))))
      .withColumn("finance_routine", financeUdf(col("text"), col("url")))
      .groupBy("source")
      .agg(Rollups.countIf(col("controlled")).as("controlled_cnt"),
        Rollups.countIf(col("finance_routine")).as("finance_cnt"),
        count(lit(1)).as("n"))
      .orderBy("source")
  }

  /** K6: fuzzy entity resolution — misspelled queries resolved against the
    * nation dim via crossJoin + difflib-parity ratio + best/runner-up margin
    * (thresholds 0.82/margin 0.02, app.py:1204-1217). Fully DuckDB-oracled:
    * the oracle reimplements SequenceMatcher.ratio in pure SQL (recursive
    * matching-block decomposition — see the q31 oracleSql entry), so the
    * difflib scorer is now hash-checked end-to-end, not just pinned by the
    * KernelsSpec goldens. */
  private def fuzzyResolve(s: SparkSession, dir: String): DataFrame = {
    val dim = nation(s, dir).select(col("n_name"))
    val queries = dim.select(
      lower(expr("substring(n_name, 1, length(n_name) - 1)")).as("q")).distinct()
    val scored = queries.crossJoin(broadcast(dim))
      .withColumn("score",
        graft.functions.TextLookup.seqRatioUdf(col("q"), lower(col("n_name"))))
    val w = Window.partitionBy("q").orderBy(col("score").desc, col("n_name"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2)
      .groupBy("q")
      .agg(
        max(when(col("rnk") === 1, col("n_name"))).as("resolved"),
        max(when(col("rnk") === 1, col("score"))).as("score"),
        max(when(col("rnk") === 2, col("score"))).as("runner_up"))
      .withColumn("accepted",
        col("score") >= 0.82 &&
          (col("score") >= 0.99 || coalesce(col("runner_up"), lit(0.0)) < col("score") - 0.02))
      .orderBy("q")
  }

  /** K6 (portable mode): the same fuzzy-resolution shape (crossJoin +
    * best/runner-up margin accept) scored by normalized Levenshtein
    * similarity — SQL-expressible in any engine, so this variant carries a
    * full DuckDB oracle. The difflib-parity scorer (q31) stays pinned by
    * KernelsSpec byte-for-byte goldens; at corpus scale Levenshtein mode is
    * also the cheaper scorer (codegen'd builtin, no UDF). */
  private def fuzzyResolveLev(s: SparkSession, dir: String): DataFrame = {
    val dim = nation(s, dir).select(col("n_name"))
    val queries = dim.select(
      lower(expr("substring(n_name, 1, length(n_name) - 1)")).as("q")).distinct()
    val scored = queries.crossJoin(broadcast(dim))
      .withColumn("score",
        lit(1.0) - levenshtein(col("q"), lower(col("n_name"))).cast("double") /
          greatest(length(col("q")), length(col("n_name"))).cast("double"))
    val w = Window.partitionBy("q").orderBy(col("score").desc, col("n_name"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2)
      .groupBy("q")
      .agg(
        max(when(col("rnk") === 1, col("n_name"))).as("resolved"),
        max(when(col("rnk") === 1, col("score"))).as("score"),
        max(when(col("rnk") === 2, col("score"))).as("runner_up"))
      .withColumn("accepted",
        col("score") >= 0.82 &&
          (col("score") >= 0.99 || coalesce(col("runner_up"), lit(0.0)) < col("score") - 0.02))
      .orderBy("q")
  }

  /** Multimodal decode (q32): synthesize media rows from documents — image
    * rows as REAL PNG bytes of a deterministic pixel law — then run the
    * batched JDK ImageIO decode. Image rows round-trip through an actual
    * codec (decoded dims + exact gray-channel checksum); audio/video rows
    * are opaque stand-ins on the documented fallback path
    * ([[graft.multimodal.Multimodal]]). */
  private def multimodalDecode(s: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.synthesizeMedia(
      documents(s, dir), "doc_id", "text")
    graft.multimodal.Multimodal.decodeFeatures(media)
      .select(col("media_id"), col("media_type"), col("decode_ok"),
        size(col("feature")).as("feature_dim"),
        col("decoded_width"), col("decoded_height"), col("gray_sum"))
      .orderBy("media_id")
  }

  /** Perceptual-hash image near-dup (q229): the multimodal member of the
    * dedup family. Image payloads (REAL PNG bytes) decode through JDK
    * ImageIO into an 8×8 nearest-neighbor gray lattice, mean-threshold to
    * a 64-bit aHash carried as 4×16-bit bands
    * ([[graft.multimodal.Multimodal.aHashBands]]), then pair through the
    * simhash banding topology — distinct-fingerprint grain, band-bucket
    * harvest, exact bit_count(xor) Hamming verify, complete to Hamming 3
    * by pigeonhole ([[Dedup.aHashPairs]]). The oracle replays the closed-
    * form pixel law (PNG is lossless, so decode ≡ law) — the Spark side
    * is the only one that touches the codec. */
  private def phashNearDupQ(s: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.synthesizeMedia(
      documents(s, dir), "doc_id", "text")
      .filter(col("media_type") === "image")
    val hashes = graft.multimodal.Multimodal.aHashBands(media)
    Dedup.aHashPairs(hashes, "media_id", "bands", maxHamming = 3)
      .orderBy("id_a", "id_b")
  }

  /** Embedding near-dup pairs via banded random-hyperplane LSH + cosine
    * threshold. Planes are deterministic literals, so the oracle replays the
    * identical band keys; cos is emitted as float (1-ulp double wobble
    * between engines' accumulators disappears at float precision). */
  private def embeddingNearDup(s: SparkSession, dir: String): DataFrame =
    // synthetic embeddings are near-orthogonal (max pairwise cos ~0.48), so
    // the "near-dup" gate is set where the data actually has neighbors
    Dedup.embeddingNearDupPairs(embeddings(s, dir), "vec_id", "embedding",
      threshold = 0.3, dim = 64, numBands = 4, bandBits = 6)
      .select(col("id_a"), col("id_b"), col("cos").cast("float").as("cos"))
      .orderBy("id_a", "id_b")

  /** SemDeDup: cluster-scoped semantic dedup — nearest-head-centroid
    * assignment (q17's replayable rule), exact cosine pairs WITHIN a cluster
    * only (the paper's move that keeps pairwise off the corpus), components,
    * keep = min id. Threshold 0.42 sits at the TOP of this corpus's
    * similarity range (near-orthogonal synthetic embeddings, max pairwise
    * cos ~0.48): true near-dups only — a looser 0.3 gate marks 2/3 of the
    * corpus as one chainy near-dup graph, which both misrepresents the
    * operator and costs ~8 propagation rounds instead of ~2. */
  private def semanticDedupQ(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    // nlist auto-scales to ceil(sqrt(n)) (q171's sizing): with the native
    // argmax kernel assignment is ~free, and the quadratic in-cluster
    // pair stage shrinks as 1/nlist — a FIXED nlist was the worst sf1
    // ratio in the suite (4.7x at 10x data; sqrt-scaling restores ~linear)
    val nlist = math.ceil(math.sqrt(
      emb.select(col("vec_id")).count().toDouble)).toInt
    val cents = Similarity.headCentroids(emb, "vec_id", "embedding", nlist)
    Dedup.semanticDedupGroups(emb, "vec_id", "embedding", cents, threshold = 0.42)
      .orderBy("id")
  }

  /** Exact duplicated-span screen (Lee et al. substring-dedup signal):
    * per-doc fraction of 8-token rolling windows whose content appears in
    * another document. */
  private def dupSpansQ(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedSpans(documents(s, dir), "doc_id", "text", windowTokens = 8)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  /** Maximal duplicated span ranges (q85): the cut list behind q68's
    * screen — overlapping cross-document-duplicated 8-token windows merged
    * into maximal token ranges per document (Lee et al. span cutting). */
  private def dupSpanRangesQ(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedSpanRanges(documents(s, dir), "doc_id", "text", windowTokens = 8)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id", "span_start")

  /** Exact substring CUT (q87): q85's maximal ranges applied — duplicated
    * spans deleted from every document, survivors rejoined (Lee et al.
    * span cutting, the step the q68 screen and q85 ranges exist for). */
  private def cutSpansQ(s: SparkSession, dir: String): DataFrame =
    Dedup.cutDuplicatedSpans(documents(s, dir), "doc_id", "text", windowTokens = 8)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  /** Suffix-array-exact duplicated span ranges (q116): q85's cut list
    * recomputed with ZERO hashing — w-gram identities from depth-truncated
    * Manber-Myers prefix doubling ([[graft.operators.SuffixArray]]).
    * Shares q85's brute-force oracle because Lee et al.'s position-cut
    * semantics provably coincides with the duplicated-w-window union;
    * a green row is differential evidence for BOTH implementations. */
  private def saDupRangesQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.SuffixArray.exactDupSpanRanges(
      documents(s, dir), "doc_id", "text", windowTokens = 8)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id", "span_start")

  /** Bigram collocation mining (q117): top-50 adjacent pairs by lift with
    * corpus support >= 3 — log-free PMI ranking (monotone transform), so
    * the score stays IEEE-exact against the oracle
    * ([[graft.operators.TextSearch.collocationsByLift]]). */
  private def collocationsQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextSearch.collocationsByLift(
      documents(s, dir), "text", minCount = 3L, k = 50)

  /** Hybrid retrieval via reciprocal-rank fusion (q119): BM25 keyword
    * top-10 fused with brute-force cosine top-10 for queries 1-3 (query j
    * probes with embedding vec_id=j; doc space is the shared id domain) —
    * rank-only fusion, so the oracle replays both retrievers' rank chains
    * and the fixed-order two-term RRF sum bit-exactly
    * ([[graft.operators.TextSearch.rrfFuse]]). */
  private def hybridRrfQ(s: SparkSession, dir: String): DataFrame = {
    val qids = bm25Queries.map(_._1)
    val bm = graft.operators.TextSearch.bm25TopK(
      documents(s, dir), "doc_id", "text", bm25Queries, k = 10)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val emb = embeddings(s, dir)
    val cos = Similarity.bruteForceTopK(
      emb, emb.filter(col("vec_id").isin(qids: _*)), "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    graft.operators.TextSearch.rrfFuse(bm, cos, k0 = 60, k = 10)
      .orderBy("query_id", "rank")
  }

  /** Embedding-truncation recall ablation (q122): overlap between the
    * full-64-dim exact top-5 and the top-5 at prefix dims 8/16/32 for the
    * q16 probe set — the Matryoshka dimension-cheapening measurement
    * ([[Similarity.truncationRecall]]). Rank-membership oracle, like
    * q16/q17. */
  private def truncationRecallQ(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    Similarity.truncationRecall(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", dims = Seq(8, 16, 32), k = 5)
      .orderBy("query_id", "dim")
  }

  /** Bigram LM familiarity scoring (q123): the log-free CCNet-style
    * reference-LM quality filter — a bigram count model trained on the
    * even-doc_id slice (deterministic stand-in for a curated corpus),
    * every doc scored by bigram coverage and mean reference-count
    * ([[graft.operators.TextSearch.bigramFamiliarity]]). */
  private def lmFamiliarityQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextSearch.bigramFamiliarity(
      documents(s, dir), "doc_id", "text",
      refFilter = col("doc_id") % 2 === 0, minRefCount = 2L)
      .orderBy("doc_id")

  /** DSIR importance resampling (q124): hashed-unigram bucket
    * distributions with `lang = 'en'` as the target slice; top-100 docs
    * by fixed-point importance ([[graft.operators.Dsir.importanceTopK]]).
    * The bucket table is O(256) regardless of corpus size. */
  private def dsirWeightsQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dsir.importanceTopK(
      documents(s, dir), "doc_id", "text",
      targetFilter = col("lang") === "en", buckets = 256, k = 100)

  /** Trailing-7-day distinct active users (q125): the contribution-
    * explode exact rolling-distinct — W1's frame semantics where the
    * aggregate (COUNT DISTINCT) can't ride a window frame
    * ([[graft.operators.SlidingDistinct.trailingDistinct]]). */
  private def slidingDistinctQ(s: SparkSession, dir: String): DataFrame = {
    def dayNum(c: Column): Column = datediff(c, lit("1970-01-01")).cast("long")
    graft.operators.SlidingDistinct.trailingDistinct(
      events(s, dir).select(dayNum(eventDay(col("ts"))).as("d"), col("user_id")),
      "d", "user_id", windowDays = 7)
      .orderBy("day")
  }

  /** k-anonymity audit (q126): equivalence classes over the customer
    * quasi-identifier projection (nation, market segment, account-balance
    * century bucket), flagging classes below k=5
    * ([[graft.operators.Anonymity.kAnonymityAudit]]). The floor(x/100)
    * bucket is exact IEEE double arithmetic in both engines. */
  private def kAnonymityQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Anonymity.kAnonymityAudit(
      customer(s, dir),
      quasiCols = Seq(col("c_nationkey").cast("long"), col("c_mktsegment"),
        floor(col("c_acctbal") / 100).cast("long")),
      quasiNames = Seq("nation", "segment", "bal_bucket"),
      k = 5)
      .orderBy("nation", "segment", "bal_bucket")

  /** Set-containment self-join (q127): the asymmetric near-dup Jaccard
    * misses — smaller shingle set >= 90% inside a larger one, sets of at
    * least 10 shingles ([[graft.operators.SetSimilarity.containmentJoin]]).
    * The brute-force DuckDB oracle proves the adapted prefix filter
    * COMPLETE, q113's differential argument. */
  private def containmentJoinQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.SetSimilarity.containmentJoin(
      documents(s, dir), "doc_id", "text",
      threshold = 0.9, minSetSize = 10, shingleSize = 3)
      .orderBy("id_a", "id_b")

  /** Banded-LSH recall ablation (q128): the q18 candidate pipeline at
    * rows-per-band 4/8/16 (bands 8/4/2) measured against the EXACT
    * 3-shingle Jaccard >= 0.7 truth set from q113's prefix-filter join —
    * the S-curve tuning measurement (more rows per band = sharper
    * threshold, lower recall below it). 3-gram shingles keep both sides
    * honest at scale: the 2-gram universe is vocabulary²-bounded and
    * floods the truth join's prefix filter. The corpus is signed ONCE
    * ([[Dedup.minhashCandidatePairsFromSigs]]) and banded three ways.
    * Truth and candidates are each independently oracle-proven
    * (q113 / q18); this query pins their composition. */
  private def lshRecallQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, dir)
    val truth = graft.Caching.track(
      graft.operators.SetSimilarity.selfJoin(
        docs, "doc_id", "text", threshold = 0.7, shingleSize = 3)
        .select(col("id_a"), col("id_b")))
    val sigs = graft.Caching.track(
      Dedup.minhashSigs(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 32, portable = true))
    val configs = Seq(4, 8, 16)
    // persist the union: both aggregates below consume it, and without the
    // cache each would re-run all three banding pipelines
    val cands = graft.Caching.track(configs.map { rpb =>
      Dedup.minhashCandidatePairsFromSigs(sigs,
        numHashes = 32, rowsPerBand = rpb, portable = true)
        .select(col("id_a"), col("id_b"))
        .withColumn("rows_per_band", lit(rpb.toLong))
    }.reduce(_ unionByName _))
    val nCand = cands.groupBy("rows_per_band")
      .agg(count(lit(1)).as("n_candidates"))
    val nCaught = cands.join(truth, Seq("id_a", "id_b"))
      .groupBy("rows_per_band").agg(count(lit(1)).as("n_caught"))
    val nTrue = truth.agg(count(lit(1)).as("n_true"))
    configs.map(_.toLong).toDF("rows_per_band")
      .join(nCand, Seq("rows_per_band"), "left")
      .join(nCaught, Seq("rows_per_band"), "left")
      .crossJoin(nTrue)
      .select(
        col("rows_per_band"),
        (lit(32L) / col("rows_per_band")).cast("long").as("bands"),
        col("n_true"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_caught"), lit(0L)).as("n_caught"),
        (coalesce(col("n_caught"), lit(0L)).cast("double") / col("n_true"))
          .as("recall"))
      .orderBy("rows_per_band")
  }

  /** Incremental trailing-distinct (q129): q125's series maintained
    * against a day-split batch (store < 2024-01-15 <= batch, q112's cut)
    * — the recompute region reads only pairs within W days of the batch
    * boundary ([[graft.operators.SlidingDistinct.trailingDistinctUpdate]]);
    * the oracle is the ONE-SHOT series, the q112 indistinguishability
    * argument. */
  private def slidingDistinctIncQ(s: SparkSession, dir: String): DataFrame = {
    def dayNum(c: Column): Column = datediff(c, lit("1970-01-01")).cast("long")
    val ev = events(s, dir)
      .select(dayNum(eventDay(col("ts"))).as("d"), col("user_id"))
    val cutDay = 19737L // 2024-01-15, q112's incremental split
    graft.operators.SlidingDistinct.trailingDistinctUpdate(
      ev.filter(col("d") < cutDay), ev.filter(col("d") >= cutDay),
      "d", "user_id", windowDays = 7)
      .orderBy("day")
  }

  /** PQ-ADC recall ablation (q130): 8×16 product-quantization codes (4
    * bytes/vector vs 256) scanned via the asymmetric distance table,
    * measured against the exact cosine top-5 for the q16 probe set;
    * codebook = the deterministic vec_id < 16 corpus slice
    * ([[Similarity.pqAdcRecall]]). Fixed-order IEEE arithmetic end to
    * end, so the oracle replays codes, ADC and ranks bit-for-bit. */
  private def pqRecallQ(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    Similarity.pqAdcRecall(
      emb, emb.filter(col("vec_id") < 10), emb.filter(col("vec_id") < 16),
      "vec_id", "embedding", m = 8, dim = 64, codebookSize = 16, k = 5)
      .orderBy("query_id")
  }

  /** Mutual-kNN graph (q131): reciprocal cosine top-5 edges over the
    * whole embedding table — the robust similarity-graph edge rule
    * ([[Similarity.mutualTopK]]); the mutuality join runs on the
    * k-bounded top-k table. */
  private def mutualKnnQ(s: SparkSession, dir: String): DataFrame =
    Similarity.mutualTopK(embeddings(s, dir), "vec_id", "embedding", k = 5)
      .orderBy("id_a", "id_b")

  /** IVF mutual-kNN (q171): q131's reciprocal edge rule on IVF-bucketed
    * candidates — the sub-quadratic scale path ([[Similarity.mutualTopKIvf]]).
    * nlist auto-scales to ⌈√n⌉ so candidate volume is O(n^1.5·nprobe) and
    * bucket-join parallelism grows with the corpus; the count that sizes it
    * scans only the id column. */
  private def mutualKnnIvfQ(s: SparkSession, dir: String): DataFrame =
    ivfMutualEdges(s, dir).orderBy("id_a", "id_b")

  /** Shared IVF mutual-kNN edge builder (q171, and the candidate source
    * for q133/q139): nlist auto-scales to ⌈√n⌉, nprobe=4, k=5. */
  private def ivfMutualEdges(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    val nlist = math.ceil(math.sqrt(
      emb.select(col("vec_id")).count().toDouble)).toInt
    val cents = Similarity.headCentroids(emb, "vec_id", "embedding", nlist)
    Similarity.mutualTopKIvf(emb, "vec_id", "embedding", k = 5,
      centroids = cents, nprobe = 4)
  }

  /** k-center coreset (q172): Gonzalez greedy farthest-point selection
    * (k=4) over the embedding table — diversity subset selection for
    * curation; output is every vector's assignment to its nearest chosen
    * exemplar ([[Coreset.kCenterAssign]]). */
  private def kcenterQ(s: SparkSession, dir: String): DataFrame =
    Coreset.kCenterAssign(embeddings(s, dir), "vec_id", "embedding", k = 4)
      .orderBy("id")

  /** Isotonic calibration (q173): cosine-to-anchor similarity calibrated
    * into a monotone match-probability against label agreement — 32 bins
    * over [-1,1], relational minimax fit ([[Calibration]]). The anchor is
    * the min-vec_id row (deterministic); the anchor itself is excluded. */
  private def isotonicCalQ(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    val a = emb.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id"), col("embedding"), col("label")).collect()(0)
    val (aid, avec, albl) = (a.getLong(0), a.getSeq[Float](1), a.getInt(2))
    val scored = emb.where(col("vec_id") =!= aid)
      .select(
        graft.plans.GraftExtensions.cosine(s, col("embedding"),
          array(avec.map(lit): _*)).as("score"),
        (col("label") === albl).as("match"))
    Calibration.isotonicCalibration(scored, "score", "match",
      lo = -1.0, hi = 1.0, bins = 32)
      .orderBy("bin")
  }

  /** Golden-record survivorship (q174): q47's minhash-LSH dup clusters
    * (singletons self-labeled) collapsed to canonical rows — min-id
    * canonical, mode-with-lexicographic-tie source/lang, max n_chars
    * ([[GoldenRecord.goldenRecords]]). */
  private def goldenRecordQ(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    val comp = Dedup.connectedComponents(graft.Caching.track(
      Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        shingleSize = 2, numHashes = 32, rowsPerBand = 8, portable = true)))
    val labeled = docs
      .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
    GoldenRecord.goldenRecords(labeled, "cluster", "doc_id",
      categorical = Seq("source", "lang"), numericMax = Seq("n_chars"))
      .orderBy("cluster")
  }

  /** kNN label-purity audit (q175): each vector's IVF top-5 neighborhood
    * scored for label agreement — the embedding-space label-noise screen
    * (low purity = mislabel suspect / boundary point). Reuses q171's
    * sub-quadratic candidate stage ([[Similarity.ivfTopKAll]]). */
  private def knnLabelPurityQ(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    val nlist = math.ceil(math.sqrt(
      emb.select(col("vec_id")).count().toDouble)).toInt
    val cents = Similarity.headCentroids(emb, "vec_id", "embedding", nlist)
    val top = Similarity.ivfTopKAll(emb, "vec_id", "embedding", k = 5,
      centroids = cents, nprobe = 4)
    val lbl = emb.select(col("vec_id"), col("label"))
    top
      .join(broadcast(lbl.toDF("query_id", "label")), Seq("query_id"))
      .join(broadcast(lbl.toDF("neighbor_id", "nlabel")), Seq("neighbor_id"))
      .groupBy(col("query_id").as("vec_id"), col("label"))
      .agg(count(lit(1)).as("n_neighbors"),
        sum(when(col("nlabel") === col("label"), 1L).otherwise(0L)).as("n_same"))
      .withColumn("purity",
        col("n_same").cast("double") / col("n_neighbors").cast("double"))
      .orderBy("vec_id")
  }

  /** Greedy max-coverage audit (q176): which 3 corpus slices (a source OR
    * a language — overlapping sets, so the answer is NOT top-3 by raw
    * count) cover the most dup-affected documents
    * ([[graft.operators.SetCover.greedyMaxCoverage]] over q68's
    * duplicated-span screen). The membership table is localCheckpointed:
    * the greedy rounds re-scan it k×2 times. */
  private def setCoverQ(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    val affected = Dedup.duplicatedSpans(docs, "doc_id", "text", windowTokens = 8)
      .filter(col("dup_windows") >= 1L).select(col("id").as("doc_id"))
    val slices = docs.join(affected, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        explode(array(concat(lit("src:"), col("source")),
          concat(lit("lang:"), col("lang")))).as("slice"))
      .localCheckpoint()
    graft.operators.SetCover.greedyMaxCoverage(slices, "slice", "doc_id", k = 3)
      .orderBy("round")
  }

  /** Frequent event trigrams (q177): contiguous length-3 paths by
    * distinct-user support with A-priori bigram pruning — q94's transition
    * matrix extended to whole paths
    * ([[graft.operators.SeqPatterns.frequentTrigrams]]). Same per-user
    * (µs, event_id) total order as q94. */
  private def seqTrigramsQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.SeqPatterns.frequentTrigrams(
      events(s, dir).withColumn("tus",
        floor(col("ts").cast("decimal(20,0)") / lit(1000)).cast("long")),
      "user_id", Seq(col("tus"), col("event_id")), "event_type",
      minSupport = 5L)
      .orderBy("t1", "t2", "t3")

  /** CUPED experiment readout (q178): post-period per-user spend adjusted
    * by the pre-period covariate (θ pooled), groups simulated as
    * user_id % 2 — the WSDM'13 variance-reduction readout
    * ([[graft.operators.Experiment.cupedReadout]]). The pre/post pivot is
    * the midpoint of the observed day range (computed from the data — a
    * 2-long collect). */
  private def cupedQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .select(col("user_id"),
        graft.operators.Funnel.epochDayFromNanos(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("cents"))
    val mm = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi")).collect()(0)
    val pivot = (mm.getLong(0) + mm.getLong(1) + 1L) / 2L
    val perUser = ev.groupBy(col("user_id"))
      .agg(sum(when(col("day") < pivot, col("cents")).otherwise(0L)).as("xc"),
        sum(when(col("day") >= pivot, col("cents")).otherwise(0L)).as("yc"))
      .select(pmod(col("user_id"), lit(2L)).as("grp"), col("xc"), col("yc"))
    graft.operators.Experiment.cupedReadout(perUser, "grp", "xc", "yc")
      .orderBy("grp")
  }

  /** l-diversity audit (q179): q126's quasi-identifier discipline with a
    * SENSITIVE attribute — per (nation, balance-bucket) class, how many
    * distinct segments appear (l < 2 = homogeneity attack: membership in
    * the class reveals the sensitive value) and how dominant the top one
    * is. Two map-side-combined aggregates, no windows. */
  private def lDiversityQ(s: SparkSession, dir: String): DataFrame = {
    val sc = customer(s, dir)
      .select(col("c_nationkey").cast("long").as("nation"),
        floor(col("c_acctbal") / 100).cast("long").as("bal_bucket"),
        col("c_mktsegment").as("segment"))
      .groupBy("nation", "bal_bucket", "segment")
      .agg(count(lit(1)).as("c"))
    sc.groupBy("nation", "bal_bucket")
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("l_distinct"),
        (max(col("c")).cast("double") / sum(col("c")).cast("double"))
          .as("top_share"))
      .withColumn("at_risk", col("l_distinct") < 2L)
      .orderBy("nation", "bal_bucket")
  }

  /** Seasonal-robust anomalies (q180): daily event counts per type,
    * deseasonalized against a per-(type, day-of-week) median baseline,
    * MAD-gated on the residuals — the STL-flavored screen that doesn't
    * flag every weekend ([[graft.operators.Seasonal]]; exact medians via
    * the q106 kernel). */
  private def seasonalAnomalyQ(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .groupBy(col("event_type"),
        graft.operators.Funnel.epochDayFromNanos(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("n"))
    graft.operators.Seasonal.weeklyRobustAnomalies(
      daily, "event_type", "day", "n")
      .select(col("series").as("event_type"), col("day"),
        col("v").cast("long").as("n"), col("expected"), col("residual"),
        col("med_resid"), col("mad"), col("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** Common-neighbor link prediction (q181): q115's co-purchase graph
    * scored for shared neighborhoods — high-CN NON-edges are transitively
    * similar pairs the direct edge rule missed
    * ([[graft.operators.Triangles.commonNeighborPairs]], super-node cap
    * 128, min 2 shared). */
  private def commonNeighborsQ(s: SparkSession, dir: String): DataFrame = {
    val op = lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = op.toDF("o", "pa").join(op.toDF("o", "pb"), "o")
      .where(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("c"))
      .where(col("c") >= 2)
      .select("pa", "pb")
    graft.operators.Triangles.commonNeighborPairs(edges, "pa", "pb",
      maxApexDegree = 128L, minCommon = 2L)
      .orderBy("id_a", "id_b")
  }

  /** As-was vs as-is bitemporal audit (q182): purchases joined to the
    * user's SCD2 activity-status dimension (q55's intervals over the
    * non-purchase stream) BOTH at purchase time and currently — the
    * late-correction report shape: how differently would history read
    * under today's dimension values. */
  private def asWasAsIsQ(s: SparkSession, dir: String): DataFrame = {
    def us(c: Column): Column =
      floor(c.cast("decimal(20,0)") / lit(1000)).cast("long")
    val ev = events(s, dir)
    val changes = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), us(col("ts")).as("t"), col("event_type").as("status"))
    val dim = graft.operators.Scd2
      .buildIntervals(changes, Seq("user_id"), "t", Seq("status"))
      .select(col("user_id").as("du"), col("status"),
        col("valid_from"), col("valid_to"), col("is_current"))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), us(col("ts")).as("tf"))
    val aswas = facts.join(dim,
        col("user_id") === col("du") && col("valid_from") <= col("tf") &&
          (col("valid_to").isNull || col("tf") < col("valid_to")), "left")
      .select(col("user_id"), col("tf"), col("status").as("s_aswas"))
    val asis = dim.filter(col("is_current"))
      .select(col("du").as("user_id"), col("status").as("s_asis"))
    aswas.join(asis, Seq("user_id"), "left")
      .groupBy(coalesce(col("s_aswas"), lit("none")).as("status_aswas"),
        coalesce(col("s_asis"), lit("none")).as("status_asis"))
      .agg(count(lit(1)).as("n_facts"))
      .withColumn("changed", col("status_aswas") =!= col("status_asis"))
      .orderBy("status_aswas", "status_asis")
  }

  /** Incremental profile survivorship (q183): per-user golden profile
    * (favorite event type = mode, max spend, last-seen day) maintained
    * from a persisted count STATE plus a new batch — history is never
    * rescanned; the (user, type, cnt) table is the sufficient statistic
    * and a mode can flip when batch votes land
    * ([[GoldenRecord.mergeModeState]]/[[GoldenRecord.modeFromState]]).
    * The oracle recomputes from ALL events — parity proves
    * incremental == full. */
  private def profileStoreQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("user_id"),
      graft.operators.Funnel.epochDayFromNanos(col("ts")).as("day"),
      col("event_type"), round(col("value") * 100).cast("long").as("cents"))
    val mm = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi")).collect()(0)
    val pivot = (mm.getLong(0) + mm.getLong(1) + 1L) / 2L
    val old = ev.filter(col("day") < pivot)
    val batch = ev.filter(col("day") >= pivot)
    val typeState = old.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val baseState = old.groupBy("user_id").agg(
      count(lit(1)).as("n1"), max(col("cents")).as("m1"), max(col("day")).as("l1"))
    val merged = GoldenRecord.mergeModeState(typeState,
      batch.select(col("user_id"), col("event_type")), "user_id", "event_type")
    val fav = GoldenRecord.modeFromState(merged,
      "user_id", "event_type", "cnt", "fav_type")
    val baseNew = batch.groupBy("user_id").agg(
      count(lit(1)).as("n2"), max(col("cents")).as("m2"), max(col("day")).as("l2"))
    baseState.join(baseNew, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("n1"), lit(0L)) + coalesce(col("n2"), lit(0L))).as("n_events"),
        greatest(coalesce(col("m1"), col("m2")), coalesce(col("m2"), col("m1")))
          .as("max_cents"),
        greatest(coalesce(col("l1"), col("l2")), coalesce(col("l2"), col("l1")))
          .as("last_day"))
      .join(fav, Seq("user_id"))
      .orderBy("user_id")
  }

  /** Coreset coverage drift (q184): the store's k-center exemplars
    * ([[Coreset.selectCenters]] on historical vectors) probed by a new
    * batch — per center: the store's coverage radius, how many new points
    * landed there, and how many fell BEYOND the radius (the "new region
    * of embedding space" alarm that says re-select before the coreset
    * misrepresents the corpus). Assignment reuses [[Coreset.assign]];
    * selection is never re-run on history. */
  private def coresetDriftQ(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    val old = emb.filter(pmod(col("vec_id"), lit(10L)) =!= 0L)
    val batch = emb.filter(pmod(col("vec_id"), lit(10L)) === 0L)
    val centers = Coreset.selectCenters(old, "vec_id", "embedding", k = 4)
    val oldA = Coreset.assign(old, "vec_id", "embedding", centers)
    val radius = oldA.groupBy("center_rank")
      .agg(max(col("center_id")).as("center_id"), max(col("dist")).as("radius"))
    val newA = Coreset.assign(batch, "vec_id", "embedding", centers)
    val stats = newA
      .join(radius.select(col("center_rank"), col("radius").as("__r")), Seq("center_rank"))
      .groupBy("center_rank")
      .agg(count(lit(1)).as("n_new"), max(col("dist")).as("max_dist_new"),
        sum(when(col("dist") > col("__r"), 1L).otherwise(0L)).as("n_beyond"))
    radius.join(stats, Seq("center_rank"), "left")
      .select(col("center_rank"), col("center_id"), col("radius"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        col("max_dist_new"),
        coalesce(col("n_beyond"), lit(0L)).as("n_beyond"))
      .orderBy("center_rank")
  }

  /** The q185 quality-gate GBDT stand-in: a fixed 3-tree additive
    * ensemble over (n_chars, n_tokens, avg_len). ONE spec generates both
    * the Catalyst CASE chain and the oracle SQL
    * ([[graft.operators.Scoring.TreeEnsemble]]). */
  private val qualityEnsemble = graft.operators.Scoring.TreeEnsemble(Seq(
    graft.operators.Scoring.Split("n_tokens", 40.0,
      graft.operators.Scoring.Leaf(-0.6),
      graft.operators.Scoring.Split("avg_len", 3.5,
        graft.operators.Scoring.Leaf(0.2), graft.operators.Scoring.Leaf(0.7))),
    graft.operators.Scoring.Split("n_chars", 150.0,
      graft.operators.Scoring.Leaf(-0.3), graft.operators.Scoring.Leaf(0.4)),
    graft.operators.Scoring.Split("avg_len", 8.0,
      graft.operators.Scoring.Split("n_tokens", 120.0,
        graft.operators.Scoring.Leaf(0.1), graft.operators.Scoring.Leaf(-0.2)),
      graft.operators.Scoring.Leaf(-0.5))))

  /** Tree-ensemble inference (q185): the quality-gate GBDT compiled to
    * nested CASE columns — UDF-free model scoring inside whole-stage
    * codegen at scan speed; margin kept raw (no sigmoid — thresholding a
    * margin is equivalent and transcendental-free). */
  private def treeScoringQ(s: SparkSession, dir: String): DataFrame = {
    val base = documents(s, dir).select(col("doc_id"),
      col("n_chars").cast("double").as("n_chars"),
      size(split(trim(col("text")), "\\s+")).cast("double").as("n_tokens"))
      .withColumn("avg_len", col("n_chars") / col("n_tokens"))
    val feat: String => Column = {
      case "n_chars" => col("n_chars")
      case "n_tokens" => col("n_tokens")
      case "avg_len" => col("avg_len")
    }
    base.select(col("doc_id"),
      qualityEnsemble.column(feat).as("margin"))
      .withColumn("accept", col("margin") > 0.0)
      .orderBy("doc_id")
  }

  /** q186's literal weight table: deterministic splitmix-derived
    * fixed-point units in [-1000, 1000] (1e-5 of a margin unit each) —
    * both faces print/apply the SAME Scala values, so the derivation
    * never needs cross-engine replay. */
  private val hashedWeightUnits: Seq[Long] = (0 until 64).map { i =>
    java.lang.Math.floorMod(
      graft.functions.PortableHash.splitmix((0xC0FFEEL << 32) | i.toLong),
      2001L) - 1000L
  }

  /** Hashing-trick linear scorer (q186): token → md5-hash bucket →
    * fixed-point weight units; the integer token-bag sum is order-free,
    * margin = units/1e5 in one final division — Weinberger et al.'s
    * fixed-dimension featurization with no vocabulary shuffle
    * ([[graft.operators.Scoring.hashedLinearMargin]]). */
  private def hashedLinearQ(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(col("doc_id"),
      graft.operators.Scoring.hashedLinearMargin(
        col("text"), hashedWeightUnits, biasUnits = 5000L,
        unitsPerOne = 100000.0).as("margin"))
      .withColumn("flagged", col("margin") > 0.0)
      .orderBy("doc_id")

  /** Leave-one-out target encoding (q187): smoothed category→rate feature
    * with the self-leak removed — row i's own label is excluded from its
    * category's rate ([[graft.operators.Encoding.looTargetEncoding]]).
    * Segment encoded against order urgency; singleton categories surface
    * null rather than an invented prior. */
  private def targetEncodingQ(s: SparkSession, dir: String): DataFrame = {
    val j = orders(s, dir).join(customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment").as("segment"),
        (col("o_orderpriority") === "1-URGENT").as("urgent"))
    graft.operators.Encoding.looTargetEncoding(
      j, "segment", "urgent", alpha = 1.0, out = "enc")
      .select(col("o_orderkey"), col("segment"), col("urgent"), col("enc"))
      .orderBy("o_orderkey")
  }

  /** RLE compressibility ablation (q188): run-length entries for
    * l_returnflag under the natural (orderkey-bucket) layout vs a
    * value-clustered layout — the encoding-choice audit a columnar
    * writer runs per row group ([[graft.operators.Layout.rleRunsReport]];
    * zones are the row-group analogue and the window unit, never a
    * global sort). */
  private def rleAuditQ(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    val li = lineitem(s, dir).select(col("l_orderkey").as("k"),
      col("l_linenumber").as("ln"), col("l_returnflag").as("v"))
    // (k, ln) is NOT unique in the synthetic lineitem — the value itself
    // is the final tiebreaker, which is run-count-safe (ambiguity only
    // ever swaps equal-value rows, and equal neighbors are never a run
    // boundary)
    val natural = Layout.rleRunsReport(li,
      ((col("k") - pmod(col("k"), lit(1000L))) / lit(1000L)).cast("long"),
      Seq(col("k"), col("ln"), col("v")), col("v"))
      .select(lit("natural").as("layout"), col("*"))
    val clustered = Layout.rleRunsReport(li,
      col("v"), Seq(col("k"), col("ln"), col("v")), col("v"))
      .select(lit("by_value").as("layout"), col("*"))
    natural.unionByName(clustered).orderBy("layout")
  }

  /** Portable-bloom FPR audit (q189): the relational bloom (k salted
    * md5 positions, filter = the distinct position SET — cross-engine by
    * construction) built on large parts, probed with keys known absent;
    * observed false-positive rate, not the textbook formula
    * ([[graft.operators.PortableBloom.fprReport]]). m=512 deliberately
    * undersized so the audit measures a non-trivial rate. */
  private def bloomFprQ(s: SparkSession, dir: String): DataFrame = {
    val p = part(s, dir)
    graft.operators.PortableBloom.fprReport(
      p.where(col("p_size") >= 48), col("p_partkey"),
      p.where(col("p_size") < 48), col("p_partkey"),
      m = 512, k = 3)
  }

  /** Partition checksum reconciliation (q190): the cheap first pass of a
    * 100 TB snapshot compare — per-day row counts + order-independent
    * md5 content checksums, full-outer diffed; only mismatching
    * partitions would proceed to q98's row-grain diff
    * ([[graft.operators.Reconcile]]). Snapshot B simulates loss of every
    * 101st event. */
  private def reconcileQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("event_id"), col("user_id"),
      col("event_type"),
      graft.operators.Funnel.epochDayFromNanos(col("ts")).as("day"))
    val b = ev.where(pmod(col("event_id"), lit(101L)) =!= 0L)
    graft.operators.Reconcile.reconcile(ev, b, col("day"),
      concat_ws(":", col("event_id"), col("user_id"), col("event_type")))
      .orderBy("part")
  }

  /** Incremental view maintenance (q191): a committed daily-count store
    * plus a late batch → delta rows for ONLY the affected (day, type)
    * groups ([[graft.operators.ViewMaintenance.countDelta]]); the
    * full-rebuild answer never materializes. Late batch simulated as
    * every 17th event. */
  private def viewMaintenanceQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(
      graft.operators.Funnel.epochDayFromNanos(col("ts")).as("day"),
      col("event_type"), col("event_id"))
    val store = ev.filter(pmod(col("event_id"), lit(17L)) =!= 0L)
      .groupBy("day", "event_type").agg(count(lit(1)).as("old_n"))
    val late = ev.filter(pmod(col("event_id"), lit(17L)) === 0L)
    graft.operators.ViewMaintenance.countDelta(
      store, late, Seq("day", "event_type"))
      .orderBy("day", "event_type")
  }

  /** Self-join size (F2) estimation audit (q192): exact Σc² for the
    * events-by-user self-join vs the optimizer-style estimate from a
    * top-10 heavy-hitter list + uniform-tail model — the skew question
    * every join-size estimator gets wrong first. All-integer moments;
    * doubles only in the final ratio. */
  private def joinEstimateQ(s: SparkSession, dir: String): DataFrame = {
    def sq(c: Column): Column =
      (c.cast("decimal(19,0)") * c.cast("decimal(19,0)")).cast("decimal(38,0)")
    val c = events(s, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("c"))
    // top-10 head via TakeOrderedAndProject (per-partition bounded heaps),
    // never a global rank window over the full key grain; the tail moments
    // are total minus head
    val head = c.orderBy(col("c").desc, col("user_id").asc).limit(10)
    val headAgg = head.agg(
      coalesce(sum(sq(col("c"))), lit(0).cast("decimal(38,0)")).as("head_f2"),
      coalesce(sum(col("c")), lit(0L)).as("__hn"),
      count(lit(1)).as("__hd"))
    val agg = c.agg(
      sum(sq(col("c"))).as("f2"),
      sum(col("c")).as("__n_all"),
      count(lit(1)).as("__d_all"))
      .crossJoin(broadcast(headAgg))
      .select(col("f2"), col("head_f2"),
        (col("__n_all") - col("__hn")).as("tail_n"),
        (col("__d_all") - col("__hd")).as("tail_d"))
    agg.select(
      col("f2").cast("double").as("true_f2"),
      (col("head_f2").cast("double") +
        when(col("tail_d") > 0L,
          (col("tail_n").cast("decimal(38,0)") * col("tail_n").cast("decimal(38,0)"))
            .cast("double") / col("tail_d").cast("double"))
          .otherwise(lit(0.0))).as("est_f2"))
      .withColumn("rel_err",
        (col("est_f2") - col("true_f2")) / col("true_f2"))
  }

  /** CUBE rollup (q193): segment × priority revenue cube with
    * grouping_id — the grouping-sets surface (marked absent in the
    * reference, present in the engine for SQL completeness); money
    * through the exact-cents policy. */
  private def cubeRollupQ(s: SparkSession, dir: String): DataFrame =
    orders(s, dir).join(customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        col("o_orderpriority").as("priority"), col("o_totalprice"))
      .cube(col("segment"), col("priority"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        Rollups.exactMoneySum(col("o_totalprice")).as("revenue"))
      .orderBy("gid", "segment", "priority")

  /** k-anonymity generalization ladder (q194): coarsen the balance
    * quasi-identifier (width 100 → 1000 → dropped) and report how many
    * classes stay under k=5 and how many rows suppression would cost at
    * each rung — the repair loop q126's audit feeds. */
  private def generalizationLadderQ(s: SparkSession, dir: String): DataFrame = {
    val c = customer(s, dir).select(
      col("c_nationkey").cast("long").as("nation"), col("c_acctbal"))
    def rung(name: String, cls: Column): DataFrame =
      c.groupBy(cls.as("cls")).agg(count(lit(1)).as("n"))
        .agg(lit(name).as("rung"),
          count(lit(1)).as("n_classes"),
          Rollups.countIf(col("n") < 5L).as("n_at_risk"),
          coalesce(sum(when(col("n") < 5L, col("n"))), lit(0L))
            .as("rows_suppressed"),
          (coalesce(sum(when(col("n") < 5L, col("n"))), lit(0L)).cast("double") /
            sum(col("n")).cast("double")).as("suppression_rate"))
    rung("w100", concat_ws(":", col("nation"),
        floor(col("c_acctbal") / 100).cast("long")))
      .unionByName(rung("w1000", concat_ws(":", col("nation"),
        floor(col("c_acctbal") / 1000).cast("long"))))
      .unionByName(rung("nation_only", col("nation").cast("string")))
      .orderBy("rung")
  }

  /** Rare-transition fluency screen (q195): corpus bigram model
    * (p(b|a) = c(ab)/c(a·)) self-scored over every document — the
    * log-free cousin of perplexity filtering (Wenzek et al.'s CCNet
    * idea): a doc whose transitions are mostly rare under the corpus
    * model is garbage/boilerplate/wrong-language; counting sub-threshold
    * transitions needs no transcendentals, so it oracle-replays exactly
    * where a log-likelihood would drift. */
  private def rareTransitionsQ(s: SparkSession, dir: String): DataFrame = {
    val inst = documents(s, dir)
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("t"))
      .where(size(col("t")) >= 2)
      .select(col("doc_id"), posexplode(col("t")).as(Seq("i", "a")))
      .withColumn("b", lead(col("a"), 1).over(
        Window.partitionBy(col("doc_id")).orderBy(col("i"))))
      .where(col("b").isNotNull)
    val cab = inst.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    val ca = inst.groupBy(col("a")).agg(count(lit(1)).as("c_a"))
    val model = cab.join(ca, Seq("a"))
      .withColumn("p", col("c_ab").cast("double") / col("c_a").cast("double"))
    inst.join(model.select(col("a"), col("b"), col("p")), Seq("a", "b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        Rollups.countIf(col("p") < 0.01).as("n_rare"))
      .withColumn("rare_frac",
        col("n_rare").cast("double") / col("n_bigrams").cast("double"))
      .withColumn("suspicious", col("rare_frac") > 0.3)
      .orderBy("doc_id")
  }

  /** Growth accounting (q196): weekly actives decomposed into
    * new/retained/resurrected with churn attributed to the first silent
    * week ([[graft.operators.Growth.accounting]]) — the canonical
    * user-base decomposition; identities
    * (active = new+retained+resurrected) spec-pinned. */
  private def growthAccountingQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Growth.accounting(
      events(s, dir).select(col("user_id"),
        (graft.operators.Funnel.epochDayFromNanos(col("ts")) / lit(7L))
          .cast("long").as("week")),
      "user_id", "week")
      .orderBy("period")

  /** DAU/WAU stickiness (q197): daily actives over trailing-7-day actives
    * — the engagement ratio every growth dashboard carries; the WAU side
    * reuses q125's contribution-explode exact rolling distinct
    * ([[graft.operators.SlidingDistinct.trailingDistinct]]). */
  private def stickinessQ(s: SparkSession, dir: String): DataFrame = {
    val pairs = events(s, dir).select(
      graft.operators.Funnel.epochDayFromNanos(col("ts")).as("d"),
      col("user_id"))
    val dau = pairs.distinct().groupBy(col("d").as("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = graft.operators.SlidingDistinct.trailingDistinct(
      pairs, "d", "user_id", windowDays = 7)
      .withColumnRenamed("n_active", "wau")
    dau.join(wau, Seq("day"))
      .withColumn("stickiness",
        col("dau").cast("double") / col("wau").cast("double"))
      .orderBy("day")
  }

  /** Sample-ratio-mismatch check (q198): the experimentation guardrail —
    * distinct users per simulated arm (user_id % 2) vs the expected 50/50
    * split, chi-square GOF with the 1-dof 5% critical value. An SRM means
    * the assignment itself is broken and every downstream readout (q178)
    * is void. */
  private def srmCheckQ(s: SparkSession, dir: String): DataFrame = {
    val arms = events(s, dir).select(col("user_id")).distinct()
      .groupBy(pmod(col("user_id"), lit(2L)).as("grp"))
      .agg(count(lit(1)).as("n"))
    val agg = arms.agg(
      sum(when(col("grp") === 0L, col("n")).otherwise(0L)).as("n_0"),
      sum(when(col("grp") === 1L, col("n")).otherwise(0L)).as("n_1"))
    agg.select(col("n_0"), col("n_1"),
      ((col("n_0") + col("n_1")).cast("double") / lit(2.0)).as("expected"))
      .withColumn("chi2",
        (col("n_0").cast("double") - col("expected")) *
          (col("n_0").cast("double") - col("expected")) / col("expected") +
        (col("n_1").cast("double") - col("expected")) *
          (col("n_1").cast("double") - col("expected")) / col("expected"))
      .withColumn("srm_flag", col("chi2") > 3.841458820694124)
  }

  /** Funnel A/B significance (q199): full-funnel conversion
    * (signup→click→purchase, q90's greedy-earliest steps) compared
    * across simulated arms with the exact-integer 2×2 chi-square
    * `N(ad−bc)²/((a+b)(c+d)(a+c)(b+d))` — products carried in
    * decimal(38,0)/HUGEINT, ONE double division at the end, so the
    * statistic replays bit-for-bit (z² on proportions is the same test). */
  private def funnelAbQ(s: SparkSession, dir: String): DataFrame = {
    val steps = graft.operators.Funnel.funnelSteps(
      events(s, dir).withColumn("tus",
        floor(col("ts").cast("decimal(20,0)") / lit(1000)).cast("long")),
      "user_id", "tus", "event_type",
      Seq("signup", "click", "purchase"))
      .select(pmod(col("user_id"), lit(2L)).as("arm"),
        (col("steps_completed") >= 3 &&
          col("t3") - col("t1") <= lit(86400000000L)).as("conv"))
    val d38 = "decimal(38,0)"
    val agg = steps.agg(
      Rollups.countIf(col("arm") === 0L && col("conv")).as("a"),
      Rollups.countIf(col("arm") === 0L && !col("conv")).as("b"),
      Rollups.countIf(col("arm") === 1L && col("conv")).as("c"),
      Rollups.countIf(col("arm") === 1L && !col("conv")).as("d"))
    agg.select(
      (col("a") + col("b")).as("n_0"), col("a").as("conv_0"),
      (col("c") + col("d")).as("n_1"), col("c").as("conv_1"),
      (col("a").cast("double") / (col("a") + col("b")).cast("double"))
        .as("rate_0"),
      (col("c").cast("double") / (col("c") + col("d")).cast("double"))
        .as("rate_1"),
      when(
        (col("a") + col("b")) > 0L && (col("c") + col("d")) > 0L &&
          (col("a") + col("c")) > 0L && (col("b") + col("d")) > 0L,
        ((col("a") + col("b") + col("c") + col("d")).cast(d38) *
          ((col("a").cast(d38) * col("d").cast(d38) -
            col("b").cast(d38) * col("c").cast(d38)) *
           (col("a").cast(d38) * col("d").cast(d38) -
            col("b").cast(d38) * col("c").cast(d38)))).cast("double") /
          ((col("a") + col("b")).cast(d38) * (col("c") + col("d")).cast(d38) *
           (col("a") + col("c")).cast(d38) * (col("b") + col("d")).cast(d38))
            .cast("double"))
        .otherwise(lit(0.0)).as("chi2"))
      .withColumn("significant", col("chi2") > 3.841458820694124)
  }

  /** Balanced-assignment makespan audit (q200): token-weighted shards
    * placed on 8 workers by plain hash vs sorted round-robin (rank by
    * weight desc, then modulo) — the scheduling question behind every
    * epoch-shard plan (q70): how much makespan does size-aware placement
    * buy. Shard grain is bounded (40 ids), the rank window runs on that
    * grain only. */
  private def makespanQ(s: SparkSession, dir: String): DataFrame = {
    val shards = documents(s, dir)
      .select(pmod(col("doc_id"), lit(40L)).as("shard"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
      .groupBy("shard").agg(sum(col("toks")).as("w"))
    val k = 8
    def report(name: String, worker: Column): DataFrame =
      shards.withColumn("worker", worker)
        .groupBy("worker").agg(sum(col("w")).as("load"))
        .agg(lit(name).as("strategy"), lit(k).as("workers"),
          max(col("load")).as("makespan"), sum(col("load")).as("total"))
        .withColumn("imbalance",
          col("makespan").cast("double") /
            (col("total").cast("double") / lit(k.toDouble)))
    val hash = report("hash", pmod(col("shard"), lit(k.toLong)))
    val lpt = report("sorted_rr",
      // shard grain (q70's fixed shard count), not rows — bounded domain
      pmod(row_number().over(
        Window.partitionBy(lit(0))
          .orderBy(col("w").desc, col("shard").asc)) - 1, lit(k)))
    hash.unionByName(lpt).orderBy("strategy")
  }

  /** The q201 candidate layouts × probe workload: zone expression and
    * range predicate per axis, shared by the Spark query and the
    * generated oracle SQL (one spec, two faces — the q185 discipline). */
  private val advisorLayouts = Seq(
    ("by_month", "date_trunc('month', CAST(l_shipdate AS DATE))"),
    ("by_orderkey", "CAST((l_orderkey - l_orderkey % 1000) / 1000 AS BIGINT)"),
    ("by_price", "CAST(floor(l_extendedprice / 1000) AS BIGINT)"))
  private val advisorProbes = Seq(
    ("ship_q1_1997", "CAST(l_shipdate AS DATE)",
      "DATE '1997-01-01'", "DATE '1997-03-31'"),
    ("orderkey_band", "l_orderkey", "10000", "20000"),
    ("price_band", "l_extendedprice", "20000.0", "30000.0"))

  /** Physical-design advisor (q201): every candidate clustering × every
    * workload predicate → fraction of rows a zone-map scan must read —
    * the "which column should this table cluster by" matrix, built from 9
    * runs of q108's pruning kernel ([[graft.operators.Layout]]). Each
    * layout wins its own axis and pays on the others; the matrix IS the
    * trade-off. */
  private def indexAdvisorQ(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    val li = lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"),
      col("l_extendedprice"))
    def zone(name: String): Column = name match {
      case "by_month" => trunc(col("l_shipdate").cast("date"), "month")
      case "by_orderkey" =>
        ((col("l_orderkey") - pmod(col("l_orderkey"), lit(1000L))) / lit(1000L))
          .cast("long")
      case "by_price" => floor(col("l_extendedprice") / 1000).cast("long")
    }
    def probe(name: String): (Column, Column, Column) = name match {
      case "ship_q1_1997" => (col("l_shipdate").cast("date"),
        lit("1997-01-01").cast("date"), lit("1997-03-31").cast("date"))
      case "orderkey_band" => (col("l_orderkey"), lit(10000L), lit(20000L))
      case "price_band" => (col("l_extendedprice"), lit(20000.0), lit(30000.0))
    }
    advisorLayouts.flatMap { case (lname, _) =>
      advisorProbes.map { case (pname, _, _, _) =>
        val (c, lo, hi) = probe(pname)
        Layout.pruningReport(li, zone(lname).cast("string"), c, lo, hi)
          .select(lit(lname).as("layout"), lit(pname).as("probe"),
            col("zones_total"), col("zones_scanned"),
            col("rows_scanned"), col("rows_matched"),
            (col("rows_scanned").cast("double") /
              col("rows_total").cast("double")).as("frac_scanned"))
      }
    }.reduce(_ unionByName _).orderBy("layout", "probe")
  }

  /** Token capacity forecast (q202): exact-OLS trend over daily corpus
    * token counts, extrapolated 7 days — capacity planning with the
    * q103 exact-moments discipline (all second moments in decimal(38,0),
    * doubles only in the slope/intercept/forecast chain, so every
    * forecast value replays bit-for-bit). */
  private def tokenForecastQ(s: SparkSession, dir: String): DataFrame = {
    val (daily, fit) = dailyOlsFit(s, dir)
    fit.select(col("slope"), col("intercept"),
        explode(sequence(col("x_max") + 1L, col("x_max") + 7L)).as("day"))
      .select(col("day"),
        (col("intercept") + col("slope") * col("day").cast("double"))
          .as("forecast_events"),
        col("slope"), col("intercept"))
      .orderBy("day")
  }

  /** Shared exact-OLS daily fit (q202/q207): returns the (x, y) daily
    * frame and a 1-row (slope, intercept, x_max) fit — all second
    * moments exact. */
  private def dailyOlsFit(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val d38 = "decimal(38,0)"
    val daily = events(s, dir)
      .groupBy(graft.operators.Funnel.epochDayFromNanos(col("ts")).as("x"))
      .agg(count(lit(1)).as("y"))
    val m = daily.agg(
      count(lit(1)).cast(d38).as("n"),
      sum(col("x").cast(d38)).as("sx"),
      sum(col("y").cast(d38)).as("sy"),
      sum((col("x").cast("decimal(19,0)") * col("y").cast("decimal(19,0)"))
        .cast(d38)).as("sxy"),
      sum((col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)"))
        .cast(d38)).as("sxx"),
      max(col("x")).as("x_max"))
    val fit = m.select(
      ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .as("slope"),
      col("sy"), col("sx"), col("n"), col("x_max"))
      .select(col("slope"),
        ((col("sy").cast("double") -
          col("slope") * col("sx").cast("double")) /
          col("n").cast("double")).as("intercept"),
        col("x_max"))
    (daily, fit)
  }

  /** Forecast with empirical bands (q207): q202's trend line plus p10/p90
    * residual quantiles from the historical fit errors — prediction
    * intervals without any distributional assumption (and without
    * transcendentals: residuals are deterministic doubles, the band edges
    * come from the exact quantile kernel, and the bands are one addition
    * each). */
  private def forecastBandsQ(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Profiling
    val (daily, fit) = dailyOlsFit(s, dir)
    val resid = daily.crossJoin(broadcast(fit))
      .select(lit("all").as("k"),
        (col("y").cast("double") -
          (col("intercept") + col("slope") * col("x").cast("double")))
          .as("r"))
    val qs = Profiling.exactQuantilesByKey(resid, "k", "r", Seq(0.1, 0.9))
    val bands = qs.groupBy("k").agg(
      max(when(col("prob") === 0.1, col("value"))).as("q10"),
      max(when(col("prob") === 0.9, col("value"))).as("q90"))
    fit.crossJoin(broadcast(bands))
      .select(col("slope"), col("intercept"), col("q10"), col("q90"),
        explode(sequence(col("x_max") + 1L, col("x_max") + 7L)).as("day"))
      .select(col("day"),
        (col("intercept") + col("slope") * col("day").cast("double"))
          .as("forecast_events"),
        ((col("intercept") + col("slope") * col("day").cast("double")) +
          col("q10")).as("lo"),
        ((col("intercept") + col("slope") * col("day").cast("double")) +
          col("q90")).as("hi"))
      .orderBy("day")
  }

  /** Longest cross-document duplicated substring per doc (q208): q116's
    * prefix-doubling loop run to FULL depth — suffix order + adjacent
    * different-doc LCP walk answers "how long", which no fixed-w window
    * screen can ([[graft.operators.SuffixArray.maxDupSubstring]]). The
    * oracle brute-forces every (length, start) gram — disjoint algorithm,
    * same answer. */
  private def maxDupSubstringQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.SuffixArray.maxDupSubstring(documents(s, dir), "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  /** Top principal direction (q209): q81's one-pass quantized Gram
    * reduction (the only data-sized stage) + 8 rounds of integer-exact
    * power iteration on the collected 64×64 matrix — the q120 fixed-point
    * idiom applied to an eigenproblem ([[graft.operators.Pca]]). Output
    * is the 64 loadings (fixed-point 2^20) and the dominant-eigenvalue
    * estimate, all engine-portable integers. */
  private def pcaPowerQ(s: SparkSession, dir: String): DataFrame = {
    val g = graft.operators.Gram.quantizedGram(embeddings(s, dir), "vec_id", "embedding", 64)
    val (v, lambdaFp) = graft.operators.Pca.topComponent(g, 64)
    import s.implicits._
    v.zipWithIndex.toSeq.map { case (l, d) => (d, l, lambdaFp) }
      .toDF("dim", "loading", "lambda_fp")
      .orderBy("dim")
  }

  /** Top-PC projection profile (q210): every vector's exact integer
    * projection onto q209's loading vector (a codegen'd long fold — the
    * "apply" face of the trainer, the q172/q184 coreset split), profiled
    * as a fixed-width histogram. Bucketing adds 2^40 (scores are bounded
    * by dim·127·2^20 ≈ 2^33) before the 26-bit shift, so the floor
    * division by 2^26 only ever sees non-negative operands — no
    * negative-division ambiguity between engines. */
  private def pcaScoresQ(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    val g = graft.operators.Gram.quantizedGram(e, "vec_id", "embedding", 64)
    val (v, _) = graft.operators.Pca.topComponent(g, 64)
    val qt = Similarity.quantizeInt8(e, "vec_id", "embedding")
    val offset = 1L << 40
    qt.select(col("vec_id"),
        graft.operators.Pca.projectionScore(col("qvec"), v).as("score"))
      .groupBy((shiftright(col("score") + lit(offset), 26) - lit(offset >> 26))
        .as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"))
      .orderBy("bucket")
  }

  /** Poisson-bootstrap confidence intervals (q211): per event type, the
    * exact mean plus the p2.5/p97.5 band of 32 deterministic Poisson(1)
    * replicate means ([[graft.operators.Bootstrap]] — hash-drawn integer
    * weights, decimal-exact weighted sums, the q207 quantile kernel for
    * the band). The distributed-bootstrap shape: one ×32 fan-out folded
    * by a map-side-combined sum, never a materialized resample. */
  private def bootstrapCiQ(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Bootstrap, Profiling}
    val ev = events(s, dir).select(col("event_type"), col("event_id"),
      round(col("value") * 100).cast("long").as("cents"))
    val reps = Bootstrap.poissonReplicateMeans(ev, "event_id", "cents", "event_type", 32)
    val ci = Profiling.exactQuantilesByKey(reps, "event_type", "mean", Seq(0.025, 0.975))
      .groupBy("event_type").agg(
        max(when(col("prob") === 0.025, col("value"))).as("lo_cents"),
        max(when(col("prob") === 0.975, col("value"))).as("hi_cents"))
    ev.groupBy("event_type")
      .agg(sum(col("cents").cast("decimal(38,0)")).as("sc"), count(lit(1)).as("n"))
      .select(col("event_type"),
        (col("sc").cast("double") / col("n").cast("double")).as("mean_cents"))
      .join(ci, "event_type")
      .orderBy("event_type")
  }

  /** Customer Pareto frontier (q212): the skyline of the customer base on
    * (lifetime cents, last order day, order count) — no other customer is
    * at least as good on all three axes and strictly better on one
    * ([[graft.operators.Skyline]]: partition-local block-nested-loop
    * skylines, then one merge pass over the polylog-sized candidate
    * union). Dims are exact longs; the oracle is the NOT EXISTS
    * dominance anti-join at the aggregated (customer) grain. */
  private def skylineQ(s: SparkSession, dir: String): DataFrame = {
    val cust = orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(
        sum(round(col("o_totalprice") * 100).cast("decimal(38,0)"))
          .cast("long").as("total_cents"),
        max(datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date")))
          .as("last_day"),
        count(lit(1)).as("n_orders"))
    graft.operators.Skyline.skylineMax(cust, "o_custkey",
        Seq("total_cents", "last_day", "n_orders"))
      .orderBy("o_custkey")
  }

  /** Token–language association screen (q213): the phi coefficient of
    * every (top-20 token, language) 2×2 presence table — the
    * feature/label-leakage audit a labeled corpus needs before training
    * on it. Counts are exact longs off one distinct (doc, token)
    * presence pass; phi's numerator/denominator are double products of
    * exact counts with PINNED association (identical expression both
    * engines), and the only non-arithmetic op is one IEEE sqrt —
    * correctly rounded everywhere, so the compare is bit-exact. */
  private def tokenPhiQ(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    val pres = d.select(col("doc_id"), col("lang"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .select("doc_id", "token").distinct()
    val top = pres.groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token")).limit(20)
    val langs = d.groupBy("lang").agg(count(lit(1)).as("nl"))
    val total = d.agg(count(lit(1)).as("n"))
    val a = pres.join(broadcast(top.select("token")), "token")
      .join(d.select("doc_id", "lang"), "doc_id")
      .groupBy("token", "lang").agg(count(lit(1)).as("a"))
    val cells = broadcast(top).crossJoin(broadcast(langs)).crossJoin(broadcast(total))
      .join(a, Seq("token", "lang"), "left")
      .select(col("token"), col("lang"),
        coalesce(col("a"), lit(0L)).as("n_both"),
        (col("df") - coalesce(col("a"), lit(0L))).as("n_token_only"),
        (col("nl") - coalesce(col("a"), lit(0L))).as("n_lang_only"),
        (col("n") - col("df") - col("nl") + coalesce(col("a"), lit(0L)))
          .as("n_neither"))
    def D(c: Column) = c.cast("double")
    val denom =
      (D(col("n_both") + col("n_token_only")) * D(col("n_lang_only") + col("n_neither"))) *
      (D(col("n_both") + col("n_lang_only")) * D(col("n_token_only") + col("n_neither")))
    cells.withColumn("phi",
        when(denom > 0.0,
          (D(col("n_both")) * D(col("n_neither")) -
            D(col("n_token_only")) * D(col("n_lang_only"))) / sqrt(denom)))
      .orderBy("token", "lang")
  }

  /** Bipartite HITS (q214): hub/authority mutual reinforcement on the
    * order→part purchase graph, 8 rounds of the integer fixed-point
    * recurrence ([[graft.operators.Hits]] — the q120 idiom with max-abs
    * normalization); top-100 parts by authority. */
  private def hitsQ(s: SparkSession, dir: String): DataFrame = {
    val ed = lineitem(s, dir)
      .select(col("l_orderkey").as("h"), col("l_partkey").as("a"))
    val (_, auth) = graft.operators.Hits.integerHits(ed, "h", "a", iterations = 8)
    auth.select(col("node").as("part"), col("score").as("authority_fp"))
      .orderBy(col("authority_fp").desc, col("part"))
      .limit(100)
  }

  /** MMR diversified selection (q215): greedy maximal-marginal-relevance
    * pick of 10 exemplars from the 50 vectors most relevant to the query
    * vector (vec 0), balancing relevance against redundancy at λ = 7/10
    * ([[graft.operators.Mmr]] — exact integer dot-product objective,
    * bounded driver rounds; the corpus pass and pool top-k are the only
    * data-sized stages). */
  private def mmrQ(s: SparkSession, dir: String): DataFrame = {
    val qt = Similarity.quantizeInt8(embeddings(s, dir), "vec_id", "embedding")
    graft.operators.Mmr.mmrSelect(qt, "vec_id", queryId = 0L, k = 10,
        poolSize = 50, lambdaNum = 7L, lambdaDen = 10L)
      .withColumnRenamed("id", "vec_id")
      .orderBy("round")
  }

  /** Personalized PageRank (q216): random walk with restart over q120's
    * symmetrized part co-order graph, teleporting to the 5 smallest part
    * ids as the seed set — seed-anchored proximity instead of global
    * importance ([[graft.operators.PageRank.integerPersonalizedPageRank]],
    * the identical integer fixed-point recurrence with seed-gated
    * teleport); top-100 by score. */
  private def pprQ(s: SparkSession, dir: String): DataFrame = {
    val op = lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val pairs = op.toDF("o", "pa").join(op.toDF("o", "pb"), "o")
      .where(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("c"))
      .where(col("c") >= 2)
    val ed = pairs.select(col("pa").as("s_"), col("pb").as("d_"))
      .unionByName(pairs.select(col("pb").as("s_"), col("pa").as("d_")))
    val seeds = ed.select(col("s_").as("node")).distinct()
      .orderBy("node").limit(5)
    graft.operators.PageRank.integerPersonalizedPageRank(
        ed, "s_", "d_", seeds, iterations = 10)
      .select(col("node").as("part"), col("score"))
      .orderBy(col("score").desc, col("part"))
      .limit(100)
  }

  /** Degree assortativity (q217): the Pearson correlation of endpoint
    * degrees over the directed edges of q120's co-order graph (Newman
    * 2002) — do popular parts co-occur with popular parts? Moments are
    * exact decimal integers off one edge pass; the coefficient is the
    * pinned-association double formula with two IEEE sqrts (the
    * q103/q202 moment posture). */
  private def assortativityQ(s: SparkSession, dir: String): DataFrame = {
    val op = lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val pairs = op.toDF("o", "pa").join(op.toDF("o", "pb"), "o")
      .where(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("c"))
      .where(col("c") >= 2)
    val ed = pairs.select(col("pa").as("s_"), col("pb").as("d_"))
      .unionByName(pairs.select(col("pb").as("s_"), col("pa").as("d_")))
    val deg = ed.groupBy("s_").agg(count(lit(1)).as("deg"))
      .select(col("s_").as("node"), col("deg"))
    val ex = ed
      .join(deg.select(col("node").as("s_"), col("deg").as("dx")), "s_")
      .join(deg.select(col("node").as("d_"), col("deg").as("dy")), "d_")
    val d38 = "decimal(38,0)"
    val m = ex.agg(
      count(lit(1)).cast(d38).as("m"),
      sum(col("dx").cast(d38)).as("sx"),
      sum(col("dy").cast(d38)).as("sy"),
      sum((col("dx") * col("dy")).cast(d38)).as("sxy"),
      sum((col("dx") * col("dx")).cast(d38)).as("sxx"),
      sum((col("dy") * col("dy")).cast(d38)).as("syy"))
    m.crossJoin(broadcast(deg.agg(
        count(lit(1)).as("n_nodes"), max(col("deg")).as("max_deg"))))
      .select(
        col("n_nodes"), col("m").cast("long").as("m_edges"), col("max_deg"),
        ((col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("m") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("assortativity"))
  }

  /** Single-linkage dendrogram profile (q219): Borůvka minimum spanning
    * forest over the part co-order graph (distance = −co-count, total
    * order (w, u, v)), then the cluster profile at every min-co-count
    * threshold read off the ONE forest — cutting MSF edges above τ yields
    * exactly the τ-threshold connected components, so the sweep costs a
    * filter + tiny-forest CC per threshold instead of a full re-cluster
    * ([[graft.operators.Mst]]). The oracle never builds the MSF: it runs
    * recursive-CTE reachability per threshold on the BASE graph — a
    * disjoint algorithm whose agreement IS the single-linkage property. */
  private def singleLinkageQ(s: SparkSession, dir: String): DataFrame = {
    val op = lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val pairs = op.toDF("o", "pa").join(op.toDF("o", "pb"), "o")
      .where(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("c"))
      .where(col("c") >= 2)
      .localCheckpoint()
    val msf = graft.operators.Mst.boruvkaMsf(
      pairs.select(col("pa"), col("pb"), (-col("c")).as("w")), "pa", "pb", "w")
      .localCheckpoint()
    val nNodes = pairs
      .select(explode(array(col("pa"), col("pb"))).as("id")).distinct().count()
    val profiles = Seq(2L, 3L, 5L, 8L).map { m =>
      val kept = msf.filter(col("w") <= lit(-m)).localCheckpoint()
      val nKept = kept.count()
      // star variant, not min-label: a forest's components are long thin
      // paths (min-label needs O(diameter) rounds and only reaches star
      // via the 20-round fallback; star is O(log n) on any shape)
      val sizes = graft.operators.Dedup.connectedComponentsStar(kept, "u", "v")
        .groupBy("component").agg(count(lit(1)).as("sz"))
        .agg(coalesce(max(col("sz")), lit(1L)).as("largest"),
          coalesce(sum(col("sz")), lit(0L)).as("clustered"))
        .select(lit(m).as("min_count"),
          lit(nNodes - nKept).as("n_clusters"), // forest: every kept edge merges two
          col("clustered").as("clustered_nodes"), col("largest").as("largest_cluster"))
      sizes
    }
    profiles.reduce(_ unionByName _).orderBy("min_count")
  }

  /** Multi-source BFS layers (q220): hop distance from the 5 smallest
    * part ids over the co-order graph, 6 unrolled min-relaxation rounds
    * (the taint-radius / contamination-blast-radius probe; the q216
    * teleport set reused as BFS sources). Distances are small exact ints
    * with a 999999 not-reached sentinel — both engines replay the same
    * relaxation. */
  private def bfsLayersQ(s: SparkSession, dir: String): DataFrame = {
    val inf = 999999L
    val op = lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val pairs = op.toDF("o", "pa").join(op.toDF("o", "pb"), "o")
      .where(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("c"))
      .where(col("c") >= 2)
    val ed = pairs.select(col("pa").as("s_"), col("pb").as("d_"))
      .unionByName(pairs.select(col("pb").as("s_"), col("pa").as("d_")))
      .localCheckpoint()
    val nodes = ed.select(col("s_").as("node")).distinct()
    val seeds = nodes.orderBy("node").limit(5)
      .withColumn("__seed", lit(true))
    var dist = nodes.join(seeds, Seq("node"), "left")
      .select(col("node"),
        when(coalesce(col("__seed"), lit(false)), lit(0L)).otherwise(lit(inf))
          .as("d"))
      .localCheckpoint()
    for (_ <- 1 to 6) {
      val relax = ed.join(dist.select(col("node").as("s_"), col("d")), "s_")
        .groupBy(col("d_").as("node")).agg(min(col("d") + lit(1L)).as("__nd"))
      dist = dist.join(relax, Seq("node"), "left")
        .select(col("node"),
          least(col("d"), coalesce(col("__nd"), lit(inf))).as("d"))
        .localCheckpoint()
    }
    dist.groupBy(col("d").as("hops")).agg(count(lit(1)).as("n_nodes"))
      .orderBy("hops")
  }

  /** Banded nearest-neighbor matching estimate (q221): each treated user
    * (odd user_id, the q199/q205 arm convention) matches the control user
    * with the nearest PRE-period spend inside the same 1024-cent band —
    * exact blocking + nearest-within-block, the scale-correct caliper
    * matching shape (a global nearest would sort the whole population on
    * one axis). The match itself is TWO as-of joins on the score axis
    * (backward + forward latest/earliest per band, [[graft.operators
    * .AsofJoin]] — one shuffle each, no pair explosion), picking the
    * nearer side (ties → backward; equal scores → the dedupe's
    * max-user_id row). Readout: matched-pair ATT on post-period spend in
    * exact cents. The oracle brute-forces the per-treated argmin with a
    * correlated subquery — disjoint formulation, same matching. */
  private def matchingAttQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .select(col("user_id"),
        graft.operators.Funnel.epochDayFromNanos(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("cents"))
    val mm = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi")).collect()(0)
    val pivot = (mm.getLong(0) + mm.getLong(1) + 1L) / 2L
    val perUser = ev.groupBy(col("user_id"))
      .agg(sum(when(col("day") < pivot, col("cents")).otherwise(0L)).as("pre"),
        sum(when(col("day") >= pivot, col("cents")).otherwise(0L)).as("post"))
      .withColumn("band", shiftright(col("pre"), 10))
      .localCheckpoint()
    val treated = perUser.filter(pmod(col("user_id"), lit(2L)) === 1L)
    val controls = perUser.filter(pmod(col("user_id"), lit(2L)) === 0L)
      .select(col("band"), col("pre").as("cpre"),
        col("user_id").as("cuser"), col("post").as("cpost"))
    def leg(forward: Boolean, suffix: String) = {
      val f = if (forward) graft.operators.AsofJoin.asofForward _
              else graft.operators.AsofJoin.asofBackward _
      f(treated, controls, Seq("band"), "pre", "cpre",
          Seq("cuser", "cpre", "cpost"))
        .select(col("user_id"), col("pre"), col("post"),
          col("cuser").as(s"cu$suffix"), col("cpre").as(s"cp$suffix"),
          col("cpost").as(s"co$suffix"))
    }
    val both = leg(forward = false, "b").join(
      leg(forward = true, "f").select(col("user_id"),
        col("cuf"), col("cpf"), col("cof")), Seq("user_id"))
    val gapB = abs(col("pre") - col("cpb"))
    val gapF = abs(col("cpf") - col("pre"))
    val useB = col("cub").isNotNull &&
      (col("cuf").isNull || gapB <= gapF) // tie -> backward
    val matched = both.select(col("user_id"), col("pre"), col("post"),
      when(useB, col("cub")).otherwise(col("cuf")).as("cu"),
      when(useB, col("cpb")).otherwise(col("cpf")).as("cp"),
      when(useB, col("cob")).otherwise(col("cof")).as("co"))
    matched.agg(
        count(lit(1)).as("n_treated"),
        count(col("cu")).as("n_matched"),
        (sum(when(col("cu").isNotNull, col("post") - col("co")))
          .cast("double") / count(col("cu")).cast("double")).as("att_cents"),
        (sum(when(col("cu").isNotNull, col("pre") - col("cp")))
          .cast("double") / count(col("cu")).cast("double")).as("mean_pre_gap"))
  }

  /** Coarsened-exact-matching stratified treatment effect (q225) — the
    * stratification estimator (Iacus, King & Porro 2012) on q221's
    * design: same pre/post split and hash treatment assignment, but
    * instead of per-unit as-of matching, units are coarsened into
    * fixed-width pre-spend bands (shiftright = floor division, matching
    * DuckDB `//`) and every band retaining BOTH arms contributes its
    * exact within-band treated/control means. All sums and counts are
    * integer-exact (cents); the only floating-point ops are the two
    * per-band divisions and one subtraction — deterministic IEEE from
    * identical integers on both faces, so the oracle is bit-parity.
    * Scale shape: one shuffle to user grain, one map-side-combined
    * shuffle to the (bounded) band grain; no window, no matching join —
    * this is the estimator a 100 TB events table can actually afford
    * when q221's per-unit matching becomes the bottleneck. */
  private def stratifiedAteQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .select(col("user_id"),
        graft.operators.Funnel.epochDayFromNanos(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("cents"))
    val mm = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi")).collect()(0)
    val pivot = (mm.getLong(0) + mm.getLong(1) + 1L) / 2L
    val perUser = ev.groupBy(col("user_id"))
      .agg(sum(when(col("day") < pivot, col("cents")).otherwise(0L)).as("pre"),
        sum(when(col("day") >= pivot, col("cents")).otherwise(0L)).as("post"))
      .withColumn("t", pmod(col("user_id"), lit(2L)))
      .withColumn("band", shiftright(col("pre"), 14))
    perUser.groupBy("band")
      .agg(
        sum(when(col("t") === 1L, 1L).otherwise(0L)).as("n_treated"),
        sum(when(col("t") === 0L, 1L).otherwise(0L)).as("n_control"),
        sum(when(col("t") === 1L, col("post")).otherwise(0L)).as("sum_treated"),
        sum(when(col("t") === 0L, col("post")).otherwise(0L)).as("sum_control"))
      .filter(col("n_treated") > 0 && col("n_control") > 0)
      .select(col("band"), col("n_treated"), col("n_control"),
        col("sum_treated"), col("sum_control"),
        (col("sum_treated").cast("double") / col("n_treated").cast("double")
          - col("sum_control").cast("double") / col("n_control").cast("double"))
          .as("att_cents"))
      .orderBy("band")
  }

  /** Kaplan–Meier risk table with right censoring (q226) — time from a
    * user's first event to first conversion ('purchase'), censored at
    * the corpus horizon for users who never convert (the classic
    * product-analytics survival design; Kaplan & Meier 1958). Emits the
    * KM SUFFICIENT STATISTIC — per duration: n_risk / n_event /
    * n_censor / hazard_ppm — entirely in exact integers (the survival
    * product itself is a trivial client-side fold over these rows; a
    * cross-engine bit-parity float product is not, so the table is the
    * honest contract). n_risk is a reverse cumulative over the
    * duration grid, whose domain is the corpus CALENDAR SPAN (day
    * grain, bounded ~hundreds) — the single-partition window is the
    * annotated bounded-domain pattern, not a corpus-sized sort. */
  private def kmRiskTableQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("user_id"),
      graft.operators.Funnel.epochDayFromNanos(col("ts")).as("day"),
      col("event_type"))
    val maxDay = ev.agg(max(col("day"))).collect()(0).getLong(0)
    val perUser = ev.groupBy("user_id").agg(
      min(col("day")).as("t0"),
      min(when(col("event_type") === "purchase", col("day"))).as("cv"))
    val durations = perUser.select(
      when(col("cv").isNotNull, col("cv") - col("t0"))
        .otherwise(lit(maxDay) - col("t0")).as("d"),
      when(col("cv").isNotNull, 1L).otherwise(0L).as("e"))
    val grid = durations.groupBy("d").agg(
      sum(col("e")).as("n_event"),
      sum(lit(1L) - col("e")).as("n_censor"))
    // duration grid ≤ corpus day span (bounded domain)
    val w = Window.partitionBy(lit(0)).orderBy(col("d").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def floorDiv(x: Column, y: Column) = ((x - pmod(x, y)) / y).cast("long")
    grid.withColumn("n_risk", sum(col("n_event") + col("n_censor")).over(w))
      .select(col("d").as("duration_days"), col("n_risk"),
        col("n_event"), col("n_censor"),
        floorDiv(col("n_event") * lit(1000000L), col("n_risk"))
          .as("hazard_ppm"))
      .orderBy("duration_days")
  }

  /** Split-conformal interval coverage audit (q227) — distribution-free
    * uncertainty for an in-engine regressor (Vovk et al.; Lei et al.
    * 2018 split-conformal recipe). Model: q202's exact-moment OLS
    * (decimal(38,0) sums, the engine-validated double fit) predicting
    * whitespace tokens from char length; doc_id%4 splits train(0,1) /
    * calibration(2) / test(3). qhat is the k-th ORDER STATISTIC of
    * calibration residuals, k = ceil(0.9(n+1)) computed as the exact
    * integer (9(n+1)+9)//10 — never a float ceil. The selection runs
    * scale-safe: distinct-residual grain → 4096 monotone range slices →
    * bounded bucket-carry prefix sums (the KS kernel shape) → qhat =
    * min residual with cumulative count ≥ k; no corpus-sized sort.
    * Output is the coverage contract: test-half share inside ±qhat, in
    * exact ppm. Every float (slope/intercept/residuals/qhat) replays
    * identically in DuckDB from the same integer moments. */
  private def conformalCoverageQ(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    val d38 = "decimal(38,0)"
    def floorDiv(x: Column, y: Column) = ((x - pmod(x, y)) / y).cast("long")
    val d = documents(s, dir).select(col("doc_id"),
      length(col("text")).cast("long").as("x"),
      TF.tokenCount(col("text")).as("y"))
    val m = d.filter(pmod(col("doc_id"), lit(4L)) < 2L).agg(
      count(lit(1)).cast(d38).as("n"),
      sum(col("x").cast(d38)).as("sx"),
      sum(col("y").cast(d38)).as("sy"),
      sum((col("x").cast("decimal(19,0)") * col("y").cast("decimal(19,0)"))
        .cast(d38)).as("sxy"),
      sum((col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)"))
        .cast(d38)).as("sxx"))
    val fit = m.select(
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("slope"),
        col("sy"), col("sx"), col("n"))
      .select(col("slope"),
        ((col("sy").cast("double") - col("slope") * col("sx").cast("double"))
          / col("n").cast("double")).as("intercept"),
        col("n").cast("long").as("n_train"))
    def resid(part: Long): DataFrame =
      d.filter(pmod(col("doc_id"), lit(4L)) === part).crossJoin(broadcast(fit))
        .withColumn("r", abs(col("y").cast("double")
          - (col("intercept") + col("slope") * col("x").cast("double"))))
    val cal = resid(2L)
    val mm = cal.agg(min(col("r")).as("mn"), max(col("r")).as("mx"),
      count(lit(1)).as("n_cal"))
    val grain = cal.groupBy("r").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(mm))
      .withColumn("bucket", when(col("mx") === col("mn"), lit(0L))
        .otherwise(least(floor((col("r") - col("mn"))
          / (col("mx") - col("mn")) * lit(4096.0)).cast("long"), lit(4095L))))
    // carry over ≤4096 buckets (bounded domain); within-bucket running
    // sum is partitioned by bucket over the distinct-residual grain
    val wCarry = Window.partitionBy(lit(0)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = grain.groupBy("bucket").agg(sum(col("c")).as("bc"))
      .withColumn("carry", coalesce(sum(col("bc")).over(wCarry), lit(0L)))
    val wIn = Window.partitionBy("bucket").orderBy(col("r"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val kExpr = floorDiv(lit(9L) * (col("n_cal") + lit(1L)) + lit(9L), lit(10L))
    val qhat = grain.join(carry.select("bucket", "carry"), "bucket")
      .withColumn("cum", col("carry") + sum(col("c")).over(wIn))
      .filter(col("cum") >= kExpr)
      .agg(min(col("r")).as("qhat"))
    val kRow = mm.select(col("n_cal"), kExpr.as("k"))
    resid(3L).crossJoin(broadcast(qhat)).crossJoin(broadcast(kRow))
      .groupBy("n_train", "n_cal", "k", "qhat", "slope", "intercept")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("r") <= col("qhat"), 1L).otherwise(0L)).as("n_covered"))
      .select(col("n_train"), col("n_cal"), col("k"), col("qhat"),
        col("n_test"), col("n_covered"),
        floorDiv(col("n_covered") * lit(1000000L), col("n_test"))
          .as("coverage_ppm"),
        col("slope"), col("intercept"))
  }

  /** CUSUM change-point detection over daily volumes (q228) — Page's
    * cumulative-sum chart (Page 1954) per event_type: baseline b =
    * pre-pivot mean daily count (integer floor), allowance a =
    * max(1, b/20), threshold h = max(1, b); the post-pivot recursion
    * S_t = max(0, S_{t-1} + x_t - b - a) runs as its PREFIX CLOSED FORM
    * S_t = P_t - min(0, min_{j<=t} P_j) (P = running sum of deviations)
    * — two stacked per-type windows, no sequential operator, no
    * flatMapGroups: the detector a 100 TB events table can run as plain
    * day-grain window algebra. Everything is exact integers, so the
    * DuckDB oracle replays the same two windows bit-for-bit. */
  private def cusumQ(s: SparkSession, dir: String): DataFrame = {
    def floorDiv(x: Column, y: Column) = ((x - pmod(x, y)) / y).cast("long")
    val ev = events(s, dir).select(col("event_type"),
      graft.operators.Funnel.epochDayFromNanos(col("ts")).as("day"))
    val mm = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi")).collect()(0)
    val pivot = (mm.getLong(0) + mm.getLong(1) + 1L) / 2L
    val daily = ev.groupBy("event_type", "day").agg(count(lit(1)).as("x"))
    val base = daily.filter(col("day") < pivot)
      .groupBy("event_type")
      .agg(floorDiv(sum(col("x")), count(lit(1))).as("b"))
      .withColumn("a", greatest(lit(1L), floorDiv(col("b"), lit(20L))))
      .withColumn("h", greatest(lit(1L), col("b")))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val post = daily.filter(col("day") >= pivot)
      .join(base, "event_type")
      .withColumn("p", sum(col("x") - col("b") - col("a")).over(w))
      .withColumn("s", col("p") - least(min(col("p")).over(w), lit(0L)))
    post.groupBy("event_type", "b", "a", "h")
      .agg(count(lit(1)).as("n_days"),
        max(col("s")).as("max_cusum"),
        min(when(col("s") > col("h"), col("day"))).as("alarm_day"),
        sum(when(col("s") > col("h"), 1L).otherwise(0L)).as("n_alarm_days"))
      .orderBy("event_type")
  }

  /** Density-aware clustering profile (q222) — the HDBSCAN core idea
    * (Campello, Moulavi & Sander 2013) on the repo's scale kernels:
    * same-IVF-bucket candidate edges (q67's assignment rule) carry exact
    * integer L2² distances (DotLong expansion d = x·x + y·y − 2x·y);
    * each point's CORE distance is its 4th-nearest candidate distance
    * (sentinel when under-connected); edges reweight to mutual
    * reachability max(d, core_a, core_b) — which is exactly what makes
    * single-linkage density-robust — and ONE Borůvka forest
    * ([[graft.operators.Mst]]) yields the cluster profile at the
    * p25/p50/p75 edge-weight thresholds (exact quantile kernel). The
    * oracle replays buckets/distances/cores/weights in SQL and derives
    * each threshold's components by recursive reachability — never
    * building the forest (the q219 disjoint-algorithm differential). */
  private def hdbscanProfileQ(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.GraftExtensions.dotLong
    val inf = 1000000000L
    val emb = embeddings(s, dir)
    val n = emb.count()
    val nlist = math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong).toInt
    val cents = Similarity.headCentroids(emb, "vec_id", "embedding", nlist)
    val qt = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .select(col("vec_id").as("id"),
        transform(col("qvec"), x => x.cast("long")).as("xv"))
    val assigned = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      .withColumn("bucket", Similarity.nearestCentroid(s, col("vec"), cents))
      .select("id", "bucket").join(qt, "id")
      .withColumn("sd", dotLong(s, col("xv"), col("xv")))
      .localCheckpoint()
    val pairs = assigned.select(col("bucket"), col("id").as("ia"),
        col("xv").as("xa"), col("sd").as("sa"))
      .join(assigned.select(col("bucket"), col("id").as("ib"),
        col("xv").as("xb"), col("sd").as("sb")), "bucket")
      .filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        (col("sa") + col("sb") - lit(2L) * dotLong(s, col("xa"), col("xb")))
          .as("d"))
      .localCheckpoint()
    // core_4: 4th-smallest candidate distance per endpoint (both
    // orientations), sentinel for under-connected points
    val w4 = Window.partitionBy("id").orderBy(col("d"), col("other"))
    val cores = pairs.select(explode(array(
        struct(col("ia").as("id"), col("ib").as("other"), col("d")),
        struct(col("ib").as("id"), col("ia").as("other"), col("d")))).as("x"))
      .select(col("x.*"))
      .withColumn("__rn", row_number().over(w4))
      .filter(col("__rn") === 4)
      .select(col("id"), col("d").as("core"))
    def coreOf(idCol: String, out: String) =
      cores.select(col("id").as(idCol), col("core").as(out))
    val weighted = pairs
      .join(coreOf("ia", "ca"), Seq("ia"), "left")
      .join(coreOf("ib", "cb"), Seq("ib"), "left")
      .select(col("ia"), col("ib"),
        greatest(col("d"), coalesce(col("ca"), lit(inf)),
          coalesce(col("cb"), lit(inf))).as("w"))
      .localCheckpoint()
    val msf = graft.operators.Mst.boruvkaMsf(weighted, "ia", "ib", "w")
      .localCheckpoint()
    val taus = graft.operators.Profiling.exactQuantilesByKey(
        weighted.withColumn("__k", lit("w")), "__k", "w", Seq(0.25, 0.5, 0.75))
      .select(col("prob"), col("value")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).sortBy(_._1)
    val profiles = taus.map { case (p, tau) =>
      val kept = msf.filter(col("w").cast("double") <= lit(tau)).localCheckpoint()
      val nKept = kept.count()
      graft.operators.Dedup.connectedComponentsStar(kept, "u", "v")
        .groupBy("component").agg(count(lit(1)).as("sz"))
        .agg(coalesce(max(col("sz")), lit(1L)).as("largest"),
          coalesce(sum(col("sz")), lit(0L)).as("clustered"))
        .select(lit(p).as("prob"), lit(tau).as("tau"),
          lit(n - nKept).as("n_clusters"),
          col("clustered").as("clustered_nodes"),
          col("largest").as("largest_cluster"))
    }
    profiles.reduce(_ unionByName _).orderBy("prob")
  }

  /** Heaps-law vocabulary growth curve (q223): distinct-token count of
    * the corpus prefix at the p12.5/p25/p50/p100 doc_id quantile cuts —
    * ONE pass computes every token's FIRST document (min doc_id) and
    * every curve point is a count over that table, so the curve costs
    * one aggregation regardless of how many checkpoints it reports (the
    * naive per-checkpoint re-scan is k× the work). The vocabulary-growth
    * exponent is the corpus-health signal the bench's replica caveat is
    * about: a replicated corpus FLATTENS this curve where a real corpus
    * keeps growing it. */
  private def heapsCurveQ(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Profiling
    val d = documents(s, dir)
    val tok = d.select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .localCheckpoint()
    val firstDoc = tok.groupBy("token").agg(min(col("doc_id")).as("first_doc"))
      .localCheckpoint()
    val taus = Profiling.exactQuantilesByKey(
        d.select(col("doc_id")).withColumn("__k", lit("d")), "__k", "doc_id",
        Seq(0.125, 0.25, 0.5, 1.0))
      .select(col("prob"), col("value")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).sortBy(_._1)
    val curves = taus.map { case (p, tau) =>
      val nd = d.filter(col("doc_id").cast("double") <= tau)
        .agg(count(lit(1)).as("n_docs"))
      val vocab = firstDoc.filter(col("first_doc").cast("double") <= tau)
        .agg(count(lit(1)).as("vocab"))
      val occ = tok.filter(col("doc_id").cast("double") <= tau)
        .agg(count(lit(1)).as("occurrences"))
      nd.crossJoin(vocab).crossJoin(occ)
        .select(lit(p).as("prob"), col("n_docs"), col("vocab"),
          col("occurrences"),
          (col("vocab").cast("double") / col("occurrences").cast("double"))
            .as("type_token_ratio"))
    }
    curves.reduce(_ unionByName _).orderBy("prob")
  }

  /** Per-node clustering-coefficient distribution (q224): Watts–Strogatz
    * local clustering over the co-order graph, bucketed by the INTEGER
    * formula `min((20·T) div (d·(d−1)), 9)` — the coefficient never
    * exists as a float on the compare path, so no boundary ulp can flip
    * a bucket (the q173 lesson, applied at design time). Rides q115's
    * degree-oriented triangle kernel ([[graft.operators.Triangles]] —
    * each triangle counted once at its lowest-ordered vertex). */
  private def clusteringCoeffQ(s: SparkSession, dir: String): DataFrame = {
    val op = lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val pairs = op.toDF("o", "pa").join(op.toDF("o", "pb"), "o")
      .where(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("c"))
      .where(col("c") >= 2)
    val nt = graft.operators.Triangles.nodeTriangles(
      pairs.select(col("pa"), col("pb")), "pa", "pb")
    nt.filter(col("degree") >= 2)
      .withColumn("bucket",
        least(expr("(20 * triangles) div (degree * (degree - 1))"), lit(9L)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_nodes"), sum(col("triangles")).as("sum_triangles"))
      .orderBy("bucket")
  }

  /** Integer-exact Lloyd k-means (q218): 3 refinement rounds from the
    * 8 smallest-id seeds over the int8 grid, every centroid coordinate a
    * fixed-point integer so the trajectory replays bit-for-bit in any
    * engine ([[graft.operators.KMeans]] — one codegen'd broadcast-literal
    * assignment pass plus one 512-key map-side-combined sum per round);
    * cluster cardinality and mean squared distance as the readout. */
  private def kmeansQ(s: SparkSession, dir: String): DataFrame = {
    val qt = Similarity.quantizeInt8(embeddings(s, dir), "vec_id", "embedding")
    graft.operators.KMeans.integerLloyd(qt, "vec_id", k = 8, iterations = 3)
      .groupBy("cid")
      .agg(count(lit(1)).as("n_members"),
        (sum(col("dist2").cast("decimal(38,0)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_dist2"))
      .orderBy("cid")
  }

  /** Cluster-quality silhouette audit (q203): per nearest-centroid
    * cluster (q17's assignment rule), the MEDIAN intra-centroid distance,
    * median distance to the best OTHER centroid, and median separation
    * margin — medians because arbitrary-double sums don't replay but the
    * exact selection kernel does ([[graft.operators.Profiling]]); all
    * distances in the double-path dot-product domain. */
  private def clusterSilhouetteQ(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Profiling
    val emb = embeddings(s, dir)
    val cents = Similarity.headCentroids(emb, "vec_id", "embedding", 16)
    // (negated-cos, cid) structs sorted ascending: [0] = assigned centroid
    // (ties to the smaller cid — the q17 rule), [1] = best OTHER centroid;
    // 1.0 + nc is bit-identical to 1.0 - cos (negation is exact)
    val scoredArr = array_sort(array(cents.map { case (cid, cvec) =>
      struct(
        (-graft.plans.GraftExtensions.cosine(s, col("embedding"),
          typedLit(cvec))).as("nc"),
        lit(cid).as("i"))
    }: _*))
    val pp = emb.select(col("vec_id"), scoredArr.as("__s"))
      .select(col("vec_id"),
        col("__s").getItem(0).getField("i").as("cluster"),
        (lit(1.0) + col("__s").getItem(0).getField("nc")).as("intra"),
        (lit(1.0) + col("__s").getItem(1).getField("nc")).as("other"))
      .withColumn("margin", col("other") - col("intra"))
      .withColumn("k", col("cluster").cast("string"))
      .localCheckpoint()
    val mi = Profiling.exactMedianByKey(pp, "k", "intra")
      .withColumnRenamed("median", "med_intra")
    val mo = Profiling.exactMedianByKey(pp, "k", "other")
      .withColumnRenamed("median", "med_other")
    val mm = Profiling.exactMedianByKey(pp, "k", "margin")
      .withColumnRenamed("median", "med_margin")
    pp.groupBy(col("cluster"), col("k")).agg(count(lit(1)).as("n"))
      .join(mi, Seq("k")).join(mo, Seq("k")).join(mm, Seq("k"))
      .select(col("cluster"), col("n"), col("med_intra"), col("med_other"),
        col("med_margin"), (col("med_margin") > 0.0).as("healthy"))
      .orderBy("cluster")
  }

  /** Watermark planner (q204): the decision q170's lateness audit
    * informs, made explicit — for candidate allowed-lateness values (1,
    * 5, 30 min in µs), the records a streaming aggregation would
    * silently drop ([[graft.operators.Sweep.watermarkPlanner]]; same
    * two-level running-max kernel, no global sort). */
  private def watermarkPlannerQ(s: SparkSession, dir: String): DataFrame = {
    def us(c: Column): Column =
      floor(c.cast("decimal(20,0)") / lit(1000)).cast("long")
    graft.operators.Sweep.watermarkPlanner(
      events(s, dir).select(col("event_id"), us(col("ts")).as("t_us")),
      "event_id", "t_us", bucketWidth = 4096L,
      candidates = Seq(60000000L, 300000000L, 1800000000L))
      .orderBy("watermark")
  }

  /** Difference-in-differences readout (q205): pre/post × arm spend
    * means with the DiD estimate `(m11−m10)−(m01−m00)` — the
    * observational cousin of q178's CUPED (same exact-cents means, same
    * pivot; a one-row 2×2 of bit-replayable doubles). */
  private def didQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("user_id"),
      graft.operators.Funnel.epochDayFromNanos(col("ts")).as("day"),
      round(col("value") * 100).cast("long").as("cents"))
    val mm = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi")).collect()(0)
    val pivot = (mm.getLong(0) + mm.getLong(1) + 1L) / 2L
    val cells = ev
      .select(pmod(col("user_id"), lit(2L)).as("arm"),
        when(col("day") >= pivot, lit(1)).otherwise(lit(0)).as("period"),
        col("cents"))
      .groupBy("arm", "period")
      .agg(sum(col("cents").cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("n"))
      .withColumn("mean",
        col("s").cast("double") / col("n").cast("double") / lit(100.0))
    def cell(a: Int, p: Int) =
      max(when(col("arm") === a.toLong && col("period") === p, col("mean")))
    cells.agg(
      cell(0, 0).as("m00"), cell(0, 1).as("m01"),
      cell(1, 0).as("m10"), cell(1, 1).as("m11"))
      .withColumn("did",
        (col("m11") - col("m10")) - (col("m01") - col("m00")))
  }

  /** Seasonal-strength index (q206): per series, 1 − MAD(deseasonalized
    * residual)/MAD(raw) clipped at 0 — the MAD-robust, log-free
    * replayable cousin of STL seasonal strength; 1 ≈ the weekly rhythm
    * explains almost all robust variation, 0 ≈ none. Reuses q180's
    * residual chain verbatim ([[graft.operators.Seasonal]]) plus one raw
    * MAD pass. */
  private def seasonalStrengthQ(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Profiling
    val daily = events(s, dir)
      .groupBy(col("event_type"),
        graft.operators.Funnel.epochDayFromNanos(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("n"))
    val seasonal = graft.operators.Seasonal.weeklyRobustAnomalies(
      daily, "event_type", "day", "n")
    val madResid = seasonal.select(col("series"), col("mad").as("mad_resid"))
      .distinct()
    val medRaw = Profiling.exactMedianByKey(
      daily.withColumnRenamed("event_type", "series"), "series", "n")
      .withColumnRenamed("median", "med_raw")
    val absdev = daily.withColumnRenamed("event_type", "series")
      .join(medRaw, Seq("series"))
      .withColumn("absdev_raw", abs(col("n") - col("med_raw")))
    val madRaw = Profiling.exactMedianByKey(absdev, "series", "absdev_raw")
      .withColumnRenamed("median", "mad_raw")
    madRaw.join(madResid, Seq("series"))
      .select(col("series").as("event_type"), col("mad_raw"), col("mad_resid"),
        when(col("mad_raw") > 0.0,
          greatest(lit(0.0), lit(1.0) - col("mad_resid") / col("mad_raw")))
          .as("strength"))
      .orderBy("event_type")
  }

  /** IVF-PQ recall (q132): q17's cell routing composed with q130's PQ
    * codes — the full billion-scale ANN layout; a query ADC-scans only
    * the codes in its 4 probed cells of 16, and the recall quantifies
    * both approximations together ([[Similarity.ivfPqRecall]]). */
  private def ivfPqRecallQ(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    Similarity.ivfPqRecall(
      emb, emb.filter(col("vec_id") < 10),
      ivfCentroids = Similarity.headCentroids(emb, "vec_id", "embedding", 16),
      pqCentroids = emb.filter(col("vec_id") < 16),
      "vec_id", "embedding",
      m = 8, dim = 64, codebookSize = 16, nprobe = 4, k = 5)
      .orderBy("query_id")
  }

  /** kNN-graph clustering (q133): q171's IVF mutual-kNN edges fused by q47's
    * min-label connected components — embedding-space document grouping
    * (the SemDeDup-adjacent cluster assignment, but from reciprocal
    * neighbor structure instead of centroid cells); every vector reports
    * with its component min-id and keeper flag, singletons self-labeled.
    * The edge graph is localCheckpointed — CC would otherwise re-run the
    * kNN ([[Dedup.connectedComponents]], q47's posture). */
  private def knnClustersQ(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    // IVF candidate edges (q171's sub-quadratic stage): kNN-graph
    // construction at scale is ANN-candidate-based by definition — the
    // exact-kNN edge rule stays spec-pinned via mutualTopK and q131.
    // localCheckpoint (not just persist): CC re-analyzes its edge plan
    // every round, and the IVF plan carries the centroid literals —
    // truncating lineage makes each round's plan O(1), not O(nlist)
    // star formulation, not min-label: the reciprocal-k graph is chainy
    // (diameter > 20 at sf0.1 — min-label hits maxIter and falls back to
    // star anyway, paying both); star converges in O(log n) rounds on any
    // shape ([[Dedup.connectedComponentsStar]])
    val edges = ivfMutualEdges(s, dir).select("id_a", "id_b").localCheckpoint()
    val comp = Dedup.connectedComponentsStar(edges)
    emb.select(col("vec_id").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("component"),
        (coalesce(col("component"), col("id")) === col("id")).as("is_keeper"))
      .orderBy("id")
  }

  /** Per-source lexical-diversity profile (q134): tokens, types, hapax
    * legomena, TTR and hapax share per document source — the Heaps-law
    * boilerplate signature ([[graft.operators.Quality.lexicalProfile]]);
    * two chained map-side-combined aggregates, no joins. */
  private def lexicalProfileQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Quality.lexicalProfile(documents(s, dir), "source", "text")
      .withColumnRenamed("grp", "source")
      .orderBy("source")

  /** Session attribution (q135): first-touch / last-touch credit for
    * every purchase under q54's 6-hour gap sessions, ordering tightened
    * to (ts, event_id) ([[graft.operators.Funnel.sessionAttribution]]);
    * pure windows over one user-key partition. */
  private def attributionQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).withColumn("tus",
      floor(col("ts").cast("decimal(20,0)") / lit(1000)).cast("long"))
    graft.operators.Funnel.sessionAttribution(
      ev, "user_id", "event_id", "tus", "event_type",
      gapUs = 21600000000L, convCond = col("event_type") === "purchase")
      .orderBy("user_id", "conv_ts_us", "conv_event_id")
  }

  /** Cross-source duplication matrix (q136): q18's near-dup candidate
    * pairs labeled with each side's source and rolled to the
    * (source, source) grain — the corpus-governance view that says which
    * feeds copy from each other (cross-source mass) vs self-duplicate
    * (diagonal); feeds the q118 group-split leakage argument. The matrix
    * is source²-bounded; the pair labeling is two doc-id joins. */
  private def dupMatrixQ(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    val src = docs.select(col("doc_id"), col("source"))
    Dedup.minhashCandidatePairs(docs, "doc_id", "text",
      shingleSize = 2, numHashes = 32, rowsPerBand = 8, portable = true)
      .select("id_a", "id_b")
      .join(src.toDF("id_a", "src_a"), "id_a")
      .join(src.toDF("id_b", "src_b"), "id_b")
      .select(least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("cross_source", col("source_a") =!= col("source_b"))
      .orderBy("source_a", "source_b")
  }

  /** Temperature-scaled domain mix (q137): q63's budgeted rebalancing
    * with τ=0.5 source shares — weight ∝ isqrt(source tokens), the
    * multilingual anti-starvation mix, all arithmetic integer (isqrt
    * replayed by the oracle via corrected floor(sqrt))
    * ([[graft.operators.Mixing.mixTemperatureSqrt]]). */
  private def temperatureMixQ(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir).select(col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val budget = d.agg(sum(col("n_tokens"))).collect()(0).getLong(0) / 2L
    graft.operators.Mixing.mixTemperatureSqrt(
        d, "doc_id", "source", "n_tokens", budget)
      .groupBy("source", "weight_ppm", "rate_ppm")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy("source")
  }

  /** Semantic decontamination (q138): q59's companion for paraphrased
    * eval leakage — corpus vectors within quantized-cosine 0.3 of any
    * test vector (vec_id < 15 as the held-out set; the synthetic
    * embeddings are near-orthogonal, so 0.3 plays the role 0.9+ does on
    * trained embeddings), the θ² = 9/100 predicate entirely in exact
    * integer int8 dot products
    * ([[graft.operators.Decontamination.semanticContamination]]). */
  private def semanticDeconQ(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    graft.operators.Decontamination.semanticContamination(
        e.filter(col("vec_id") >= 15), e.filter(col("vec_id") < 15),
        "vec_id", "embedding", thrNum = 9L, thrDen = 100L)
      .orderBy("vec_id")
  }

  /** Label propagation (q139): q171's IVF mutual-kNN edges carrying seed
    * labels (vec_id % 4 == 0 keeps its `label`) to unlabeled vectors in
    * two synchronous majority rounds, ties to the smaller label —
    * semi-supervised corpus labeling ([[graft.operators.LabelProp]]).
    * The edge graph is localCheckpointed: both rounds reuse it
    * (q133's posture). */
  private def labelPropQ(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    val edges = ivfMutualEdges(s, dir).select("id_a", "id_b").localCheckpoint()
    val nodes = e.select(col("vec_id"),
      when(pmod(col("vec_id"), lit(4L)) === 0L, col("label").cast("long"))
        .as("seed"))
    graft.operators.LabelProp.propagate(
        nodes, edges, "vec_id", "seed", "id_a", "id_b", rounds = 2)
      .orderBy("vec_id")
  }

  /** Total-variation drift by source (q140): each source's doc-length
    * histogram vs the pooled corpus over exact global deciles, distance
    * in integer ppm — the PSI-style governance screen without PSI's
    * engine-specific `ln` ([[graft.operators.Drift.tvDriftBySource]]). */
  private def tvDriftQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Drift.tvDriftBySource(
      documents(s, dir).select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("n_chars")),
      "doc_id", "source", "n_chars", nBins = 10)
      .orderBy("source")

  /** N-gram novelty per epoch (q141): fraction of each epoch's distinct
    * 3-grams first seen in that epoch (epoch = doc_id mod 8 stands in for
    * the crawl snapshot) — the freshness audit that catches recycled
    * crawls ([[graft.operators.Drift.ngramNovelty]]). */
  private def ngramNoveltyQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Drift.ngramNovelty(
      documents(s, dir).select(
        pmod(col("doc_id"), lit(8L)).as("epoch_src"), col("text")),
      "epoch_src", "text", n = 3)
      .orderBy("epoch")

  /** Dedup ROI (q142): what q47's dedup decision is WORTH — per source,
    * the token mass sitting on non-keeper docs (component ≠ doc id under
    * min-label CC over the q18 LSH pair graph) and the floor-ppm savings
    * a keep-one-per-component pass would realize. The governance number
    * that justifies (or kills) a dedup stage before anyone runs it. */
  private def dedupRoiQ(s: SparkSession, dir: String): DataFrame = {
    def floorDiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("long")
    val docs = documents(s, dir)
    val comp = Dedup.connectedComponents(graft.Caching.track(
      Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        shingleSize = 2, numHashes = 32, rowsPerBand = 8, portable = true)))
    docs.select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("__t"))
      .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("__comp", coalesce(col("component"), col("doc_id")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__t")).as("n_tokens"),
        sum(when(col("__comp") =!= col("doc_id"), col("__t")).otherwise(0L))
          .as("dup_tokens"))
      .withColumn("savings_ppm",
        floorDiv(col("dup_tokens") * 1000000L, greatest(col("n_tokens"), lit(1L))))
      .orderBy("source")
  }

  /** Packing-efficiency audit (q143): padding overhead of a no-packing
    * loader at context lengths 128/512/2048 vs the fully-packed ideal —
    * the capacity-planning pass run before q50's greedy packing
    * ([[graft.operators.Batching.packingEfficiency]]). */
  private def packingEfficiencyQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Batching.packingEfficiency(
      documents(s, dir).select(
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok")),
      "n_tok", Seq(128L, 512L, 2048L))
      .orderBy("ctx")

  /** Shuffle-key skew audit (q144): the pre-flight for hashing events on
    * user_id — heaviest-key share, top-10 mass, mean rows/key, all exact
    * integer ppm ([[graft.operators.Profiling.keySkewAudit]]). */
  private def skewAuditQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.keySkewAudit(events(s, dir), "user_id")

  /** Simpson token concentration (q145): per-source probability two
    * sampled tokens are the same type — boilerplate detection without
    * entropy's `ln`; decimal(38,0) ppm so the statistic survives
    * 100 TB-group token counts
    * ([[graft.operators.Quality.simpsonConcentration]]). */
  private def simpsonQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Quality.simpsonConcentration(
      documents(s, dir), "source", "text")
      .withColumnRenamed("grp", "source")
      .orderBy("source")

  /** Shard-growth stability (q147): fraction of doc ids that migrate when
    * shards grow 8 → 9 under mod-hashing (~8/9 move) vs rendezvous
    * hashing (~1/9 move) — the consistent-hashing ROI measured on the
    * corpus itself ([[graft.operators.Sharding.shardStability]]). */
  private def shardStabilityQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sharding.shardStability(
      documents(s, dir).select("doc_id"), "doc_id", k = 8, k2 = 9)
      .orderBy("strategy")

  /** Persistent heavy hitters (q148): users in the exact daily top-20 on
    * at least 3 days — the stability screen separating structurally hot
    * shuffle keys from one-off bursts
    * ([[graft.operators.HeavyHitters.persistentHitters]]); day is the
    * integer epoch-day of the canonical ns timestamp (q91's grid). */
  private def persistentHittersQ(s: SparkSession, dir: String): DataFrame = {
    val nsPerDay = 86400000000000L
    val day = ((col("ts") - pmod(col("ts"), lit(nsPerDay))) / lit(nsPerDay))
      .cast("long")
    graft.operators.HeavyHitters.persistentHitters(
      events(s, dir).select(day.as("day"), col("user_id")),
      "day", "user_id", k = 20, minEpochs = 3)
      .orderBy("key")
  }

  /** Source vocabulary Jaccard (q149): exact pairwise word-set overlap
    * between sources — the vocabulary-level companion to q136's
    * document-level dup matrix
    * ([[graft.operators.Drift.sourceVocabJaccard]]). */
  private def sourceJaccardQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Drift.sourceVocabJaccard(
      documents(s, dir), "source", "text")
      .orderBy("source_a", "source_b")

  /** Doc-length Gini (q150): inequality of token mass over documents per
    * source — closed-form exact Gini on the distinct-value grain in
    * decimal(38,0) ([[graft.operators.Profiling.giniByKey]]); near-0 =
    * uniform lengths (template suspicion), near-1e6 = a few giants carry
    * the source. */
  private def lengthGiniQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.giniByKey(
      documents(s, dir).select(col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok")),
      "source", "n_tok")
      .orderBy("source")

  /** Winnowing fingerprint density (q151): Schleimer et al. robust
    * winnowing at k=4, w=4 over the corpus, rolled to per-source gram /
    * fingerprint mass — the empirical check of the 2/(w+1) sampling rate
    * ([[graft.operators.Winnowing.densityByGroup]]). */
  private def winnowDensityQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Winnowing.densityByGroup(
      documents(s, dir), "doc_id", "source", "text", k = 4, w = 4)
      .withColumnRenamed("grp", "source")
      .orderBy("source")

  /** Winnow dup candidates (q152): doc pairs sharing ≥ 2 winnow
    * fingerprints, with containment against the smaller fingerprint set —
    * the MOSS screen ([[graft.operators.Winnowing.dupCandidates]]). */
  private def winnowPairsQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Winnowing.dupCandidates(
      documents(s, dir), "doc_id", "text", k = 4, w = 4, minShared = 2)
      .orderBy("doc_a", "doc_b")

  /** Quality-gate agreement (q153): Cohen's kappa per source between the
    * row-local Gopher gate (q89) and the corpus-relative curation gate
    * (q76) — how far the cheap gate can proxy the expensive one once
    * base-rate agreement is discounted
    * ([[graft.operators.Agreement.cohenKappa]]). */
  private def gateKappaQ(s: SparkSession, dir: String): DataFrame = {
    val gop = graft.operators.Quality.gopherRules(documents(s, dir), "text")
      .select(col("doc_id"), col("pass").as("gopher_pass"))
    val cur = curationVerdicts(s, dir).select(col("doc_id"), col("keep"))
    val j = documents(s, dir).select(col("doc_id"), col("source"))
      .join(gop, "doc_id").join(cur, "doc_id")
    graft.operators.Agreement.cohenKappa(j, "source", "gopher_pass", "keep")
      .orderBy("source")
  }

  /** Length-AUC gate audit (q154): exact tie-corrected ROC-AUC of raw
    * document length predicting the q76 curation verdict, per source —
    * an AUC near 1e6 says the composed gate is mostly a length proxy
    * there ([[graft.operators.Profiling.rankSumAuc]]). */
  private def lengthAucQ(s: SparkSession, dir: String): DataFrame = {
    val j = documents(s, dir).select(col("doc_id"), col("source"), col("n_chars"))
      .join(curationVerdicts(s, dir).select(col("doc_id"), col("keep")), "doc_id")
    graft.operators.Profiling.rankSumAuc(j, "source", "n_chars", "keep")
      .orderBy("source")
  }

  /** KS drift (q155): exact two-sample Kolmogorov-Smirnov distance of
    * each source's token-length distribution vs the pooled corpus — the
    * bin-free companion to q140's decile TV
    * ([[graft.operators.Drift.ksAgainstPool]]). */
  private def ksDriftQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Drift.ksAgainstPool(
      documents(s, dir).select(col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok")),
      "source", "n_tok")
      .orderBy("source")

  /** Spearman rank correlation (q156): quantity↔price monotone
    * co-movement per return flag — q103's Pearson re-run on midranks,
    * the outlier-robust association number
    * ([[graft.operators.Rollups.spearmanByKey]]). */
  private def spearmanQ(s: SparkSession, dir: String): DataFrame =
    Rollups.spearmanByKey(
      lineitem(s, dir).select(col("l_returnflag"),
        round(col("l_quantity") * 100).cast("long").as("qx"),
        round(col("l_extendedprice") * 100).cast("long").as("qy")),
      "l_returnflag", "qx", "qy")
      .orderBy("l_returnflag")

  /** Benford audit (q157): leading-digit law deviation of order totals
    * per priority — the synthetic/fabricated-numerics screen, exact
    * integer ppm against fixed floor-ppm Benford expectations
    * ([[graft.operators.Profiling.benfordAudit]]). */
  private def benfordQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.benfordAudit(
      orders(s, dir).select(col("o_orderpriority").as("pri"),
        col("o_totalprice").as("v")),
      "pri", "v")
      .orderBy("pri", "digit")

  /** Peak concurrent sessions per day (q158): q54's 6-hour-gap session
    * intervals swept with the two-level prefix sum
    * ([[graft.operators.Sweep.maxConcurrency]]) — the capacity-planning
    * number, exact at every boundary instant. */
  private def maxConcurrencyQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .select(col("user_id"), eventTs(col("ts")).as("t"))
    val sess = ev
      .groupBy(col("user_id"), session_window(col("t"), "6 hours").as("w"))
      .agg(unix_micros(min(col("t"))).as("s_us"),
        unix_micros(max(col("t"))).as("e_us"))
    graft.operators.Sweep.maxConcurrency(sess, "s_us", "e_us",
        bucketWidth = 86400000000L)
      .withColumnRenamed("bucket", "day")
      .orderBy("day")
  }

  /** Hilbert-vs-Morton locality audit (q160): both curves index the same
    * distinct (suppkey, partkey) cell grid at 16 bits/dim; the score is
    * the total Manhattan distance between INDEX-CONSECUTIVE cells (the
    * walk a range scan takes through key space), summed within index
    * buckets so the comparison windows stay bucket-partitioned —
    * cross-bucket steps (1 per bucket) are uncounted on both sides
    * ([[graft.operators.Layout.withHilbert2]] vs
    * [[graft.operators.Layout.zValue2]]). Morton pays its quadrant jumps
    * here; Hilbert's consecutive indices are grid-adjacent by
    * construction, so its walk is near-minimal. A bbox-area score would
    * NOT discriminate — at dyadic bucket sizes both curves tile the same
    * rectangles; the jump metric is the one that sees Morton's seams. */
  private def hilbertLocalityQ(s: SparkSession, dir: String): DataFrame = {
    val cells = lineitem(s, dir)
      .select(col("l_suppkey").as("cx"), col("l_partkey").as("cy")).distinct()
    val z = cells
      .withColumn("idx", graft.operators.Layout.zValue2(col("cx"), col("cy"), bits = 16))
      .withColumn("strategy", lit("zorder"))
    val h = graft.operators.Layout.withHilbert2(cells, "cx", "cy", bits = 16, "idx")
      .withColumn("strategy", lit("hilbert"))
    val w = Window.partitionBy(col("strategy"), col("bucket")).orderBy(col("idx"))
    z.unionByName(h)
      .withColumn("bucket", shiftright(col("idx"), 14))
      .withColumn("__px", lag(col("cx"), 1).over(w))
      .withColumn("__py", lag(col("cy"), 1).over(w))
      .withColumn("__jump",
        when(col("__px").isNull, lit(0L))
          .otherwise(abs(col("cx") - col("__px")) + abs(col("cy") - col("__py"))))
      .groupBy(col("strategy"))
      .agg(count(lit(1)).as("n_cells"),
        sum(when(col("__px").isNull, 0L).otherwise(1L)).as("n_steps"),
        sum(col("__jump")).as("total_jump"))
      .orderBy("strategy")
  }

  /** Gate calibration table (q161): keep-rate of the q76 curation verdict
    * per global length decile per source — the reliability diagram behind
    * q154's single-number AUC (which deciles carry the gate's decisions,
    * and do sources disagree at fixed length?). Deciles via
    * [[graft.operators.Batching.groupedNtile]] (distinct-grain, engine
    * ntile semantics). */
  private def gateCalibrationQ(s: SparkSession, dir: String): DataFrame = {
    def floorDiv(a: Column, b: Column) = ((a - pmod(a, b)) / b).cast("long")
    val d = documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
      .withColumn("__k", lit(1))
    val tiled = graft.operators.Batching.groupedNtile(
      d, keyCols = Seq("__k"), valCol = "n_chars", idCol = "doc_id",
      n = 10, outCol = "decile")
    tiled
      .join(curationVerdicts(s, dir).select(col("doc_id"), col("keep")), "doc_id")
      .groupBy(col("source"), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
      .withColumn("keep_ppm",
        floorDiv(col("n_keep") * lit(1000000L), col("n_docs")))
      .orderBy("source", "decile")
  }

  /** LSH precision — candidate-verify (q162): every q18 minhash candidate
    * pair re-scored by EXACT distinct-2-shingle Jaccard (integer
    * cross-multiplication, floor ppm) with a τ=0.5 verified flag — the
    * precision companion to q128's recall ablation: recall says what the
    * bands miss, this says what they drag in. Verification work is
    * bounded by |candidates| × shingles/doc (the banding + maxBucket
    * screen paid for that bound already); zero-overlap candidates (band
    * collisions) survive via the left join. */
  /** Exact distinct-2-shingle Jaccard for a given (id_a, id_b) pair table
    * (shared by q162/q169): (id_a, id_b, n_inter, n_union, jaccard_ppm).
    * Work is |pairs| × shingles/doc; zero-overlap pairs survive via the
    * left join. */
  private def exactPairJaccard(docs: DataFrame, pairs: DataFrame): DataFrame = {
    def floorDiv(a: Column, b: Column) = ((a - pmod(a, b)) / b).cast("long")
    val toks = split(trim(lower(col("text"))), "\\s+")
    val sh = docs.select(col("doc_id"), toks.as("__t"))
      .select(col("doc_id"),
        explode(sequence(lit(1), greatest(size(col("__t")) - 1, lit(1)))).as("__p"),
        col("__t"))
      .select(col("doc_id"),
        array_join(slice(col("__t"), col("__p"), lit(2)), " ").as("sh"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.toDF("id_a", "__sha"), "id_a")
      .join(sh.toDF("__ib", "__shb"),
        col("id_b") === col("__ib") && col("__sha") === col("__shb"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    pairs
      .join(inter, Seq("id_a", "id_b"), "left")
      .join(sizes.toDF("id_a", "__na"), "id_a")
      .join(sizes.toDF("id_b", "__nb"), "id_b")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .withColumn("n_union", col("__na") + col("__nb") - col("n_inter"))
      .withColumn("jaccard_ppm",
        floorDiv(col("n_inter") * lit(1000000L), col("n_union")))
      .select(col("id_a"), col("id_b"), col("n_inter"), col("n_union"),
        col("jaccard_ppm"))
  }

  private def lshPrecisionQ(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        shingleSize = 2, numHashes = 32, rowsPerBand = 8, portable = true)
      .select("id_a", "id_b")
    exactPairJaccard(docs, pairs)
      .withColumn("verified", col("jaccard_ppm") >= 500000L)
      .orderBy("id_a", "id_b")
  }

  /** Minhash-estimate calibration (q169): candidate pairs binned by the
    * number of agreeing signature components (the engine's Jaccard
    * ESTIMATE, est/32) against the floor-mean of the exact shingle
    * Jaccard in each bin — the trust table for every minhash-based
    * decision upstream (is 24/32 really ≈ 0.75?). */
  private def minhashCalibrationQ(s: SparkSession, dir: String): DataFrame = {
    def floorDiv(a: Column, b: Column) = ((a - pmod(a, b)) / b).cast("long")
    val docs = documents(s, dir)
    val sigs = Dedup.minhashSigs(docs, "doc_id", "text",
      shingleSize = 2, numHashes = 32, portable = true)
    val pairs = Dedup.minhashCandidatePairsFromSigs(
        sigs, numHashes = 32, rowsPerBand = 8, maxBucket = 1000, portable = true)
      .select("id_a", "id_b")
    val est = pairs
      .join(sigs.toDF("id_a", "__sa"), "id_a")
      .join(sigs.toDF("id_b", "__sb"), "id_b")
      .withColumn("est_matches",
        aggregate(
          zip_with(col("__sa"), col("__sb"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v))
      .select("id_a", "id_b", "est_matches")
    est.join(exactPairJaccard(docs, pairs), Seq("id_a", "id_b"))
      .groupBy(col("est_matches"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("jaccard_ppm")).as("__sum_true"))
      .select(col("est_matches"),
        floorDiv(col("est_matches") * lit(1000000L), lit(32L)).as("est_ppm"),
        col("n_pairs"),
        floorDiv(col("__sum_true"), col("n_pairs")).as("avg_true_ppm"))
      .orderBy("est_matches")
  }

  /** Quality-aware dedup keeper (q163): q47's connected components with
    * the canonical document chosen by MAX token mass (ties → smaller id)
    * instead of min-id — the arbitration a curation pipeline actually
    * wants (keep the richest copy); one max-struct aggregate per
    * component, token mass re-priced per cluster. */
  private def qualityKeeperQ(s: SparkSession, dir: String): DataFrame = {
    val comp = Dedup.connectedComponents(
      graft.Caching.track(
        Dedup.minhashCandidatePairs(documents(s, dir), "doc_id", "text",
          shingleSize = 2, numHashes = 32, rowsPerBand = 8, portable = true)))
    val toksz = documents(s, dir).select(col("doc_id").as("id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
    comp.join(toksz, "id")
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_docs"),
        max(struct(col("n_tok"), (-col("id")).as("nid"))).as("__best"),
        sum(col("n_tok")).as("total_toks"))
      .select(col("component"), col("n_docs"),
        (-col("__best.nid")).as("keeper_doc"),
        col("__best.n_tok").as("keeper_toks"),
        col("total_toks"),
        (col("total_toks") - col("__best.n_tok")).as("saved_toks"))
      .orderBy("component")
  }

  /** Percentile normalization (q164): each document's length mapped to
    * its midrank percentile WITHIN its source (floor ppm) — the
    * cross-source-comparable score a fair gate thresholds on
    * ([[graft.operators.Profiling.percentileNormalize]]). */
  private def percentileNormalizeQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.percentileNormalize(
      documents(s, dir).select(col("doc_id"), col("source"), col("n_chars")),
      "source", "n_chars", "doc_id")
      .orderBy("doc_id")

  /** Zipf vocabulary segmentation (q165): head/middle/tail split of the
    * corpus vocabulary at 50%/90% cumulative token mass, computed on the
    * frequency-of-frequency grain
    * ([[graft.operators.Quality.zipfSegments]]) — the vocab-cap sizing
    * view (what a cutoff keeps vs drops). */
  private def zipfSegmentsQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Quality.zipfSegments(documents(s, dir), "text")
      .orderBy("segment")

  /** Item-item cosine (q166): part-grain co-order similarity — the
    * neighborhood recommender kernel as exact squared-cosine ppm
    * ([[graft.operators.Itemsets.itemCosine]]); top-50 pairs by
    * (cos², a, b) total order. */
  private def itemCosineQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Itemsets.itemCosine(
      lineitem(s, dir).select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey", minSupport = 3L)
      .orderBy(col("cos2_ppm").desc, col("item_a"), col("item_b"))
      .limit(50)

  /** Repurchase survival curve (q167): per purchase-to-purchase gap, the
    * share landing within 1/7/14/30 days — the retention-horizon number
    * behind q91's day-grid retention; gaps from a (user, ts, event_id)
    * total-ordered lag, one pass, unpivoted by `stack`. */
  private def repurchaseCurveQ(s: SparkSession, dir: String): DataFrame = {
    def us(c: Column): Column =
      floor(c.cast("decimal(20,0)") / lit(1000)).cast("long")
    val day = 86400000000L
    val p = events(s, dir).filter(col("event_type") === "purchase")
      .select(col("user_id"), us(col("ts")).as("t"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
    val gaps = p.withColumn("__gap", col("t") - lag(col("t"), 1).over(w))
      .filter(col("__gap").isNotNull)
    def cWithin(k: Int) =
      sum(when(col("__gap") <= k * day, 1L).otherwise(0L)).as(s"c$k")
    val a = gaps.agg(count(lit(1)).as("n"),
      cWithin(1), cWithin(7), cWithin(14), cWithin(30))
    def floorDiv(x: Column, y: Column) = ((x - pmod(x, y)) / y).cast("long")
    a.select(expr(
        "stack(4, 1L, c1, 7L, c7, 14L, c14, 30L, c30) AS (k_days, n_within)"),
        col("n"))
      .select(col("k_days"), col("n").as("n_gaps"), col("n_within"),
        floorDiv(col("n_within") * lit(1000000L), col("n")).as("within_ppm"))
      .orderBy("k_days")
  }

  /** Two-sample KS (q168): token-length drift between the first and
    * second corpus halves (doc_id % 8 split) — the frozen-baseline drift
    * gate's kernel ([[graft.operators.Drift.ksTwoSample]]; streaming
    * face: [[graft.streaming.DriftStream]]). */
  private def ksTwoSampleQ(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir).select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
    graft.operators.Drift.ksTwoSample(
      d.filter(pmod(col("doc_id"), lit(8L)) < 4).select("n_tok"),
      d.filter(pmod(col("doc_id"), lit(8L)) >= 4).select("n_tok"),
      "n_tok")
  }

  /** Event lateness audit (q170): per 4096-arrival bucket, how far behind
    * the running max event-time records arrive (>5 min counted late) —
    * the watermark-sizing number for every streaming job in the engine
    * ([[graft.operators.Sweep.latenessAudit]]; arrival proxy =
    * ingestion-monotone event_id). */
  private def latenessAuditQ(s: SparkSession, dir: String): DataFrame = {
    def us(c: Column): Column =
      floor(c.cast("decimal(20,0)") / lit(1000)).cast("long")
    graft.operators.Sweep.latenessAudit(
      events(s, dir).select(col("event_id"), us(col("ts")).as("t_us")),
      "event_id", "t_us", bucketWidth = 4096L, lateThreshold = 300000000L)
      .orderBy("bucket")
  }

  /** Salted skew-join equivalence (q159): lineitem × part revenue per
    * brand through [[graft.operators.SaltedJoin.saltedEquiJoin]] (8
    * deterministic salts, forced shuffle join) — row-identical to the
    * plain join the oracle runs, while the heaviest part key's rows
    * spread over 8 tasks instead of one. */
  private def saltedJoinQ(s: SparkSession, dir: String): DataFrame = {
    val big = lineitem(s, dir).select(col("l_partkey").as("pk"),
      col("l_orderkey"), col("l_linenumber"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val small = part(s, dir).select(col("p_partkey").as("pk"), col("p_brand"))
    graft.operators.SaltedJoin.saltedEquiJoin(
        big, small, "pk", saltBy = Seq("l_orderkey", "l_linenumber"), nSalts = 8)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("revenue_cents"))
      .orderBy("p_brand")
  }

  /** Rank-biased overlap (q146): rank-aware agreement of the int8
    * quantized top-5 (q48) with the exact cosine top-5 (q16) per probe —
    * p=1/2 truncated RBO in exact scaled integers
    * ([[graft.operators.Similarity.rboTruncated]]). */
  private def rboQ(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    val exact = Similarity.bruteForceTopK(
      e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
    val qt = Similarity.quantizeInt8(e, "vec_id", "embedding")
    val quant = Similarity.bruteForceTopKQuantized(
      qt, qt.filter(col("vec_id") < 10), "vec_id", 5)
    Similarity.rboTruncated(exact, quant, depth = 5).orderBy("query_id")
  }

  /** Skip-gram co-occurrence mining (q121): q117's windowed
    * generalization — unordered token pairs within 3 positions, corpus
    * support >= 5, ranked by the same IEEE-exact lift
    * ([[graft.operators.TextSearch.skipgramByLift]]). */
  private def skipgramQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextSearch.skipgramByLift(
      documents(s, dir), "text", window = 3, minCount = 5L, k = 50)

  /** Integer-exact PageRank (q120): 10 damped iterations over the
    * symmetrized part co-order graph (q115's edge rule), all arithmetic
    * in long `div` so the DuckDB oracle unrolls the identical fixed-point
    * recurrence ([[graft.operators.PageRank]]); top-100 by score. */
  private def pageRankQ(s: SparkSession, dir: String): DataFrame = {
    val op = lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val pairs = op.toDF("o", "pa").join(op.toDF("o", "pb"), "o")
      .where(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("c"))
      .where(col("c") >= 2)
    val ed = pairs.select(col("pa").as("s_"), col("pb").as("d_"))
      .unionByName(pairs.select(col("pb").as("s_"), col("pa").as("d_")))
    graft.operators.PageRank.integerPageRank(ed, "s_", "d_", iterations = 10)
      .select(col("node").as("part"), col("score"))
      .orderBy(col("score").desc, col("part"))
      .limit(100)
  }

  /** Group-aware split audit (q118): leakage-safe train/val/test keyed on
    * the `source` group (every doc of a source co-assigns) with the
    * achieved-vs-target row-share drift report
    * ([[graft.operators.Splits.groupSplitAudit]]). */
  private def groupSplitQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Splits.groupSplitAudit(
      documents(s, dir), "source",
      Seq(("train", 800000L), ("val", 100000L), ("test", 100000L)))
      .orderBy("split")

  /** BPE pair statistics (q88): the first iteration of the BPE trainer's
    * merge loop — adjacent character pairs weighted by word frequency,
    * top 20. The corpus is touched once (word-frequency hash-agg); the
    * pair count runs at vocabulary grain ([[graft.operators.Bpe]]). */
  private def bpePairsQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Bpe.pairCounts(
      graft.operators.Bpe.wordFrequencies(documents(s, dir), "text"))
      .orderBy(col("n").desc, col("a"), col("b"))
      .limit(20)

  /** Gopher rule battery (q89): the standard pretraining quality filter
    * set (word-count/mean-word-length bounds, symbol ratio, alphabetic
    * fraction, stop-word evidence) as exact-arithmetic projections. */
  private def gopherRulesQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Quality.gopherRules(documents(s, dir), "text")
      .select("doc_id", "n_words", "mean_word_len", "symbol_ratio",
        "alpha_frac", "stop_hits", "words_ok", "word_len_ok", "symbol_ok",
        "alpha_ok", "stop_ok", "pass")
      .orderBy("doc_id")

  /** Ordered funnel (q90): greedy-earliest signup → click → purchase per
    * user — one Exchange on user_id total (chained conditional-min windows
    * + a partitioning-reusing collapse; [[graft.operators.Funnel]]).
    * The whole funnel runs on epoch-MICROS longs (exact decimal ns→µs
    * floor, the `Tables.eventTs` idiom): DuckDB reads parquet
    * TIMESTAMP(NANOS) at µs precision, so µs is the shared comparison
    * domain. */
  private def funnelQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.funnelSteps(
      events(s, dir).withColumn("tus",
        floor(col("ts").cast("decimal(20,0)") / lit(1000)).cast("long")),
      "user_id", "tus", "event_type",
      Seq("signup", "click", "purchase"))
      .select(col("user_id"), col("t1").as("t1_us"), col("t2").as("t2_us"),
        col("t3").as("t3_us"), col("steps_completed"))
      .orderBy("user_id")

  /** Retention triangle (q91): weekly cohorts on the integer epoch-day
    * grid — two map-side-combined hash aggs + one co-partitioned join,
    * distinct users via the two-level aggregate (no countDistinct
    * Expand). */
  private def retentionQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    graft.operators.Funnel.retentionCohorts(ev, "user_id",
      graft.operators.Funnel.epochDayFromNanos(col("ts")))
      .orderBy("cohort_week", "week_offset")
  }

  /** Exact heavy hitters via two-pass Misra-Gries (q92): tokens above
    * 1/30 of the corpus stream. k=29 < the 31-token domain, so the
    * sketch's decrement path genuinely runs; the exact recount pass
    * makes the answer deterministic and oracle-able
    * ([[graft.operators.HeavyHitters]]). */
  private def heavyHittersQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.HeavyHitters.exactHeavyHitters(
      documents(s, dir)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok")),
      "tok", k = 29)
      .withColumnRenamed("item", "tok")

  /** Vocabulary-coverage gate (q93): CCNet-reduced LM filter — reference
    * vocab = top-20 terms of the `lang='en'` slice ([[graft.operators
    * .TextSearch.buildVocab]]), coverage = exact in-vocab/total token
    * ratio per document, broadcast-joined (no corpus shuffle beyond the
    * per-doc count collapse). */
  private def vocabCoverageQ(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    val vocab = graft.operators.TextSearch.buildVocab(
      docs.filter(col("lang") === "en"), "text", minCount = 1L, maxVocab = 20)
    graft.operators.TextSearch.vocabCoverage(docs, "doc_id", "text", vocab)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("in_vocab"),
        col("coverage"), (col("coverage") >= lit(0.65)).as("pass"))
      .orderBy("doc_id")
  }

  /** Incremental funnel (q96): fold the funnel state over a time-split of
    * the events (before/after 2024-01-15, the ordered-batch contract) —
    * the result must equal q90's full recompute, so it shares q90's
    * oracle SQL verbatim. */
  private def funnelIncQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).withColumn("tus",
      floor(col("ts").cast("decimal(20,0)") / lit(1000)).cast("long"))
    val steps = Seq("signup", "click", "purchase")
    val cut = lit(1705276800000000L) // 2024-01-15T00:00:00Z epoch µs
    val st0 = graft.operators.Funnel.funnelSteps(
      ev.filter(col("tus") < cut), "user_id", "tus", "event_type", steps)
    graft.operators.Funnel.updateFunnelState(
      st0, ev.filter(col("tus") >= cut), "user_id", "tus", "event_type", steps)
      .select(col("user_id"), col("t1").as("t1_us"), col("t2").as("t2_us"),
        col("t3").as("t3_us"), col("steps_completed"))
      .orderBy("user_id")
  }

  /** Markov transition matrix (q94): per-user next-event bigrams with
    * exact conditional probabilities — ordered in the engine-shared
    * (epoch-µs, event_id) domain ([[graft.operators.Funnel]]). */
  private def transitionsQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.transitionCounts(
      events(s, dir).withColumn("tus",
        floor(col("ts").cast("decimal(20,0)") / lit(1000)).cast("long")),
      "user_id", Seq(col("tus"), col("event_id")), "event_type")
      .orderBy("prev_type", "event_type")

  /** RFM segmentation (q95): recency/frequency/monetary quartiles via the
    * scale-safe grouped ntile (exact NTILE parity, no corpus-grain
    * window) — money through the exact-cents policy. */
  private def rfmQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.rfm(
      events(s, dir), "user_id",
      graft.operators.Funnel.epochDayFromNanos(col("ts")), col("value"))
      .orderBy("user_id")

  /** LSH bucket-occupancy probe (q86): the pre-flight that tells you how
    * q18's pair harvest will scale before running it — expansion work is
    * `sum(occ*(occ-1)/2)` over band buckets at the distinct-signature
    * grain. Same portable params as q18, so DuckDB replays the pipeline. */
  private def minhashStatsQ(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashBucketStats(documents(s, dir), "doc_id", "text",
      shingleSize = 2, numHashes = 32, rowsPerBand = 8, portable = true)

  /** Content-defined chunking: rolling-hash boundaries (window 4, divisor
    * 64 → ~64-token expected chunks) — edit-robust chunk alignment for
    * chunk-level dedup. Entirely in-row; the only added plan node is the
    * chunk explode. */
  private def cdcChunksQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunking.cdcChunks(documents(s, dir), "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id", "chunk_idx")

  /** Quantized Gram matrix (PCA/whitening prep): one [[graft.operators.Gram]]
    * pass over the int8-quantized embedding corpus — integer-exact X^T X,
    * constant 16 KiB aggregation buffers, only per-partition buffers
    * shuffle. The explode-free treeAggregate pattern for matrix moments. */
  private def gramQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Gram.quantizedGram(
      embeddings(s, dir), "vec_id", "embedding", dim = 64)

  /** Join-size / skew pre-flight (q83): exact self-join cardinality of
    * lineitem on l_partkey from the per-key count table — the probe a
    * planner runs before committing a 100 TB pair join (the dedup
    * bucket-size question as a query). Facts are read once each side;
    * only count tables join. */
  private def joinSizeQ(s: SparkSession, dir: String): DataFrame = {
    val li = lineitem(s, dir).select(col("l_partkey"))
    graft.operators.SkewJoin.joinSizeEstimate(li, li, "l_partkey", topK = 5)
  }

  /** Categorical profile of documents(lang, source): the string twin of
    * q57 — same melted-grain posture (one shuffle, count-of-grain instead
    * of countDistinct, WindowGroupLimit-bounded top-k). */
  private def profileCatQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.profileCategorical(
      documents(s, dir), Seq("lang", "source"), topK = 5)

  /** Z-order layout audit: Morton keys over (l_suppkey, l_partkey), fixed
    * z-ranges as stand-in files — per range, BOTH dimensions are bounded
    * (the locality that makes file stats prune on either column). */
  private def zorderLayoutQ(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .select(col("l_suppkey"), col("l_partkey"))
      .withColumn("z", graft.operators.Layout.zValue2(
        col("l_suppkey"), col("l_partkey"), bits = 16))
      .withColumn("zbucket", shiftright(col("z"), 16))
      .groupBy("zbucket")
      .agg(
        count(lit(1)).as("n"),
        min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"),
        min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"))
      .orderBy("zbucket")

  /** Chunk-level exact dedup — the CDC payoff: duplicated content chunks
    * across documents (edit-robust, so shared passages dedupe even when
    * the surrounding documents differ). One hash-agg shuffle over q78's
    * chunk table. */
  private def chunkDedupQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunking.cdcChunks(documents(s, dir), "doc_id", "text")
      // two-level agg: (hash, doc) grain first, then count(*) IS the
      // distinct doc count — no countDistinct Expand (the q02 pattern)
      .groupBy("chunk_hash", "id")
      .agg(count(lit(1)).as("c"), min(col("n_tokens")).as("nt"))
      .groupBy("chunk_hash")
      .agg(
        sum(col("c")).as("n_chunks"),
        count(lit(1)).as("n_docs"),
        min(col("nt")).as("n_tokens"),
        min(col("id")).as("keep_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy("chunk_hash")

  /** Per-language quality deciles: ntile feature-bucketing of doc length
    * within each language — the discretization step before balanced
    * per-bucket sampling. Total order (n_chars, doc_id) makes the tiling
    * deterministic; ntile's floor-distribution semantics agree across
    * engines. NOT a per-language `ntile` window (that would put an entire
    * language — English is ~half a pretraining corpus — into one window
    * partition): [[graft.operators.Batching.groupedNtile]] derives the same
    * tile from the distinct-length histogram rank, bit-identically. */
  private def qualityDecilesQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Batching.groupedNtile(
      documents(s, dir)
        .select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("n_chars")),
      keyCols = Seq("lang"), valCol = "n_chars", idCol = "doc_id",
      n = 10, outCol = "decile")
      .orderBy("doc_id")

  /** End-to-end curation gate: the keep/drop decision table a pretraining
    * pipeline derives per document — composes the q42 repetition rule, the
    * q15 language-id agreement check, and the q62 per-language exact-p25
    * length gate into one verdict. */
  /** The unordered verdict table backing q76 (and the agreement/AUC
    * diagnostics q153/q154, which must not inherit its presentation
    * sort). */
  private def curationVerdicts(s: SparkSession, dir: String): DataFrame = {
    val rep = repetitionStats(s, dir).select(col("doc_id"), col("repetitive"))
    val lng = langId(s, dir)
      .select(col("doc_id"),
        (col("predicted_lang") === col("lang")).as("lang_match"))
    val d = documents(s, dir)
      .select(col("doc_id"), col("lang"), length(col("text")).cast("long").as("n_chars"))
    val th = graft.operators.Profiling.exactQuantilesByKey(d, "lang", "n_chars", Seq(0.25))
      .select(col("lang"), col("value").as("p25"))
    val len = d.join(broadcast(th), "lang")
      .select(col("doc_id"), (col("n_chars") >= col("p25")).as("length_ok"))
    rep.join(lng, "doc_id").join(len, "doc_id")
      .withColumn("keep",
        !col("repetitive") && col("lang_match") && col("length_ok"))
  }

  private def curationGateQ(s: SparkSession, dir: String): DataFrame =
    curationVerdicts(s, dir).orderBy("doc_id")

  /** Interval-overlap join (binned, each pair exactly once): click
    * influence windows [ts, ts+5min] × purchase attribution windows
    * [ts-30min, ts] per user — the attribution-overlap shape. */
  private def intervalOverlapQ(s: SparkSession, dir: String): DataFrame = {
    def us(c: Column): Column =
      floor(c.cast("decimal(20,0)") / lit(1000)).cast("long")
    val ev = events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        us(col("ts")).as("c_start"))
      .withColumn("c_end", col("c_start") + lit(300000000L))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        us(col("ts")).as("p_end"))
      .withColumn("p_start", col("p_end") - lit(1800000000L))
    graft.operators.RangeJoin.intervalOverlapJoin(
      clicks, purchases, Seq("user_id"),
      "c_start", "c_end", "p_start", "p_end", binWidth = 1800000000L)
      .select(col("user_id"), col("click_id"), col("purchase_id"))
      .orderBy("user_id", "click_id", "purchase_id")
  }

  /** Incremental duplicated-span screen: batch docs (doc_id % 7 == 0)
    * scored against the span store of the rest — dup = in-store OR
    * repeated within the batch. */
  private def dupSpansIncQ(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    Dedup.duplicatedSpansIncremental(
      docs.filter(col("doc_id") % 7 === 0),
      Dedup.spanWindowHashes(docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text")
        .select("h").distinct(),
      "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** A14: composite weighted signal score (entity-store.js:131-215 /
    * app.py:765-804 weight normalization): plain column arithmetic over a
    * small weight map. */
  private def signalScore(s: SparkSession, dir: String): DataFrame = {
    val weights = Map("click" -> 0.24, "view" -> 0.24, "error" -> 0.16,
      "purchase" -> 0.12, "signup" -> 0.10)
    val pivots = weights.toSeq.sortBy(_._1).map { case (t, _) =>
      Rollups.countIf(col("event_type") === t).as(s"${t}_cnt")
    }
    val score = weights.toSeq.sortBy(_._1).map { case (t, w) =>
      col(s"${t}_cnt") * w
    }.reduce(_ + _)
    events(s, dir)
      .groupBy(col("user_id"))
      .agg(pivots.head, pivots.tail: _*)
      .withColumn("signal_score", score)
      .orderBy(col("signal_score").desc, col("user_id"))
      .limit(50)
  }

  /** A16: distinct counting — exact (oracle-checked) alongside the
    * approx_count_distinct scale path (its estimate is engine-specific, so
    * the oracle checks exact only and the approx column is informational...
    * kept out of the oracle projection). */
  private def distinctUsers(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** A13: reproducible uniform sample via hash ordering — ORDER BY
    * md5(key) LIMIT n. The reference samples with a seeded PRNG
    * (scripts/sentiment_bakeoff.py:204-300) whose stream is engine-specific;
    * hash-ordering gives the same statistical uniformity but is
    * deterministic across engines AND stable under data growth (a row's
    * hash never changes), which is what a training pipeline wants from a
    * holdout/eval sample. md5 exists in both Spark and DuckDB → oracled. */
  private def randomSample(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .orderBy(md5(col("o_orderkey").cast("string")), col("o_orderkey"))
      .limit(100)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** Per-key EXACT-SIZE deterministic sample: k docs per language in md5
    * order — the per-stratum twin of q36 (rate-based q51 gives exact RATES;
    * this gives exact COUNTS per class, the eval-set construction shape).
    * The rank window is bounded by WindowGroupLimit pushdown (per-partition
    * top-k heaps), never a full per-key sort spill. */
  private def perKeySample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    documents(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 20)
      .select(col("lang"), col("rn"), col("doc_id"))
      .orderBy("lang", "rn")
  }

  /** K10: evidence summarizer — histogram rows by type/reason/sentiment
    * (app.py:1515-1561). */
  private def evidenceHistogram(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("bucket",
        when(col("value") >= 100, "high").when(col("value") >= 30, "mid")
          .otherwise("low"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        Rollups.exactMoneySum(col("value")).as("total_value"))
      .orderBy("event_type", "bucket")

  /** K7: storyline candidate scores — per-bucket affected counts, episode
    * durations (W7) and the fixed linear score formula
    * (app.py:1968-2211: affected*6 + items*0.35 + avg_dur*2 + active*0.4). */
  private def storylineScores(s: SparkSession, dir: String): DataFrame = {
    // one linear pipeline (window -> episode agg -> bucket agg): the
    // previous two-branch + join shape recomputed the scan->daily-aggregate
    // subplan for the per-bucket counts AND the episode durations
    val daily = eventsDaily(s, dir).filter(col("n") >= 2)
    val w = Window.partitionBy("user_id").orderBy("d")
    val islands = daily
      .withColumn("__pd", lag(col("d"), 1).over(w))
      .withColumn("__brk",
        when(col("__pd").isNull || datediff(col("d"), col("__pd")) > 1, 1).otherwise(0))
      .withColumn("__island",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val perEpisode = islands.groupBy(col("user_id"), col("__island"))
      .agg(count(lit(1)).as("episode_days"), sum(col("n")).as("ep_n"))
    perEpisode.withColumn("bucket", col("user_id") % 5)
      .groupBy("bucket")
      .agg(countDistinct(col("user_id")).as("affected"),
        sum(col("ep_n")).as("items"),
        (sum(col("episode_days")).cast("double") / count(lit(1))).as("avg_dur"),
        sum(col("episode_days")).as("active_days"))
      .withColumn("score",
        col("affected") * 6.0 + col("items") * 0.35 +
          col("avg_dur") * 2.0 + col("active_days") * 0.4)
      .orderBy(col("score").desc, col("bucket"))
  }

  /** sector_baseline endpoint rows (app.py:4523-4569) over the TPC-H-ish
    * tables: entities = customers, sector = market segment, metric = daily
    * order count. The window end is the SECTOR's own max date, resolved
    * lazily (broadcast 1-row crossJoin, no driver probe); ordering pins
    * Postgres NULLS FIRST on latest_value. Rounded summary/peer columns are
    * exercised by InsightsSpec goldens (bround vs binary-round engines
    * diverge at shortest-repr boundaries, so they stay out of the oracle). */
  private def sectorBaselineRows(s: SparkSession, dir: String): DataFrame = {
    val daily = orders(s, dir)
      .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("date"))
      .agg(count(lit(1)).as("n"))
    val edm = daily.select(
      col("date"), lit("brand").as("entity_type"),
      col("o_custkey").as("entity_id"), col("o_custkey").as("company_id"),
      lit(null).cast("string").as("ceo_id"), lit("").as("entity_name"),
      lit("").as("company"), lit("").as("ceo"), col("n"))
    val companies = customer(s, dir).select(
      col("c_custkey").as("id"), col("c_name").as("name"),
      col("c_mktsegment").as("sector"))
    val rows = graft.api.Insights.sectorBaselineRows(
      edm, companies, "brand", "BUILDING", "n", days = 30)
    rows.select(col("entity_id"), col("sector"), col("window_value"),
      col("avg_daily_value"), col("latest_value"), col("peak_value"),
      col("signal_days"))
      .orderBy(col("entity_id"))
  }

  /** aggregate_crisis_patterns endpoint (app.py:4696-4784) over events:
    * entities = users, tags = event types, with the group-normalization
    * ladder exercised (well-formed / empty / garbage labels + an is_crisis
    * flag). The rounded avg-duration column is dropped from the oracle
    * surface (same bround-parity rationale as q45); everything else —
    * episodes, medians, actives, top-3 samples — is hash-checked. */
  private def crisisPatterns(s: SparkSession, dir: String): DataFrame = {
    // The daily agg feeds BOTH the max-date probe and the narrative rows;
    // the probe recompute is absorbed by aggregateCrisisPatterns' persist
    // of `base` (plan-identical calls share the cache entry — an eager
    // localCheckpoint here benched 2x slower by defeating that reuse)
    val daily = events(s, dir)
      .groupBy(col("user_id"), eventDay(col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val rows = daily.select(
      col("d").as("date"),
      col("user_id").cast("string").as("entity_id"),
      concat(lit("user_"), col("user_id")).as("entity_name"),
      concat(lit("S"), col("user_id") % 3).as("sector"),
      col("event_type").as("narrative_primary_tag"),
      when(col("event_type").isin("click", "view"), "crisis")
        .when(col("event_type") === "error", "")
        .otherwise("odd_label").as("narrative_primary_group"),
      when(col("event_type") === "error", true)
        .otherwise(lit(null).cast("boolean")).as("narrative_is_crisis"),
      col("n").as("negative_item_count"))
      // window end = global max day, attached lazily (no driver probe)
      .crossJoin(broadcast(daily.agg(max(col("d")).as("__end"))))
    graft.api.Insights.aggregateCrisisPatterns(rows, col("__end"), "brand", false, 10)
      .select(col("tag"), col("group"), col("is_crisis"),
        col("brands_affected"), col("episode_count"),
        col("median_duration_days"), col("max_duration_days"),
        col("active_entities_latest"), col("total_negative_items"),
        array_join(col("sample_entities"), "|").as("sample_entities"))
  }

  /** §5 bake-off analogue: confusion matrix of labeled lang vs the langid
    * heuristic's prediction (reference scripts/sentiment_bakeoff.py writes
    * agreement + confusion artifacts; this is that comparison as a query). */
  private def langConfusion(s: SparkSession, dir: String): DataFrame =
    graft.operators.LabelEval.confusionMatrix(
      langId(s, dir), col("lang"), col("predicted_lang"))
      .orderBy("expected", "predicted")

  /** Exact n-gram Jaccard dedup (the verification kernel behind MinHash-LSH
    * q18, as its own oracled query): word-bigram shingle sets, candidates
    * blocked by language over a bounded doc subset, true Jaccard emitted for
    * pairs >= 0.08. At corpus scale the candidate generator is the LSH pass
    * (q18) — this exact kernel then runs only on its survivors, so the
    * bounded block here mirrors the real per-bucket workload shape. */
  private def jaccardVerify(s: SparkSession, dir: String): DataFrame = {
    // Relational shape (explode shingles -> join on the shingle -> count
    // intersections) rather than carrying shingle arrays through the pair
    // join: 3x faster at sf0.1 and the only shape that scales (shuffle is
    // O(shingle rows), never O(pairs x shingle-set)). Shingles travel as
    // xxhash64 of the token tuple — a pairwise 2^-64 collision tolerance,
    // standard for dedup pipelines; verified bit-identical to the string-
    // shingle oracle on this corpus.
    val sh = documents(s, dir).filter(col("doc_id") < 200)
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(SF.tokenShingleHashes(col("text"), 2))).as("s"))
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.select(col("lang"), col("doc_id").as("id_a"), col("s"))
      .join(sh.select(col("lang").as("lb"), col("doc_id").as("id_b"), col("s").as("sb")),
        col("lang") === col("lb") && col("s") === col("sb") && col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("m"))
    inter
      .join(counts.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
      .join(counts.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
      .withColumn("jaccard", col("m").cast("double") / (col("na") + col("nb") - col("m")))
      .filter(col("jaccard") >= lit(0.08))
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** Quality scoring for corpus filtering: length/token/stopword/digit
    * components plus an integer-threshold keep flag (classic pretraining
    * quality-filter shape; ratios are exact int/int double divisions →
    * bit-identical across engines). */
  private def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val toks = TF.tokenCount(col("text"))
    val stopHits = TF.stopwordHits(col("text"), Seq("the", "a", "and", "of"))
    documents(s, dir)
      .select(col("doc_id"),
        TF.charCount(col("text")).as("n_chars"),
        toks.as("n_tokens"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("long").as("n_nonspace"),
        stopHits.as("stop_hits"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", ""))).cast("long").as("n_digits"))
      .withColumn("mean_token_len", col("n_nonspace").cast("double") / col("n_tokens"))
      .withColumn("stopword_ratio", col("stop_hits").cast("double") / col("n_tokens"))
      .withColumn("digit_ratio", col("n_digits").cast("double") / col("n_chars"))
      .withColumn("quality_ok",
        col("n_tokens") >= 20 && col("n_tokens") <= 2000 && col("stop_hits") >= 1)
      .orderBy("doc_id")
  }

  /** Repetition quality stats (Gopher-style pretraining filters): distinct-
    * token ratio, top-unigram fraction, top-bigram fraction per document,
    * plus a repetitive flag. Fully relational (explode -> two chained
    * aggregations per n-gram order); ratios are exact int/int divisions. */
  private def repetitionStats(s: SparkSession, dir: String): DataFrame = {
    // n-grams travel as xxhash64 values, never as strings (string bigram
    // materialization benched 3x slower); counts over hashes equal counts
    // over the strings modulo a 2^-64 pairwise collision tolerance
    val toks = documents(s, dir).select(col("doc_id"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("t"))
    val uni = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("distinct_tokens"),
        max(col("c")).as("top_token_count"))
    val bi = documents(s, dir).select(col("doc_id"),
      explode(SF.tokenShingleHashes(col("text"), 2)).as("h"))
      .groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_bigrams"),
        max(col("c")).as("top_bigram_count"))
    uni.join(bi, "doc_id")
      .withColumn("distinct_ratio",
        col("distinct_tokens").cast("double") / col("n_tokens"))
      .withColumn("top_token_frac",
        col("top_token_count").cast("double") / col("n_tokens"))
      .withColumn("top_bigram_frac",
        col("top_bigram_count").cast("double") / col("n_bigrams"))
      .withColumn("repetitive",
        col("top_token_frac") > lit(0.1) || col("top_bigram_frac") > lit(0.05))
      .orderBy("doc_id")
  }

  /** Bloom-prune semi join (q97): the fact scan is pruned by a dim-key
    * bloom filter BEFORE the join exchange ([[graft.operators.BloomPrune]],
    * the explicit form of AQE's runtime row-level filtering); the exact
    * semi join removes the fpp residue, so the result is bit-identical to
    * the plain `l_partkey IN (dim keys)` aggregate at ANY fpp — only the
    * shuffled volume changes. At 100 TB this is the difference between
    * shuffling the whole fact table and shuffling the ~6% that can match. */
  private def bloomPruneQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.BloomPrune.semiJoin(
      lineitem(s, dir), col("l_partkey"),
      part(s, dir).where(col("p_size") >= 48), col("p_partkey"),
      expectedItems = 100000L, fpp = 0.01)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        Rollups.exactMoneySum(col("l_quantity"), 0).as("sum_qty"))
      .orderBy("l_returnflag")

  /** Snapshot diff (q98): CDC compare of two derived snapshots of orders —
    * "old" drops every 7th key (→ added in new) and doubles the price on
    * every 5th (→ changed) — one full-outer join at the key grain, change
    * classification + changed-column list as codegen expressions
    * ([[graft.operators.TableDiff]]). */
  private def tableDiffQ(s: SparkSession, dir: String): DataFrame = {
    val base = orders(s, dir).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val old = base.where(col("o_orderkey") % 7 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
    graft.operators.TableDiff.diff(old, base, Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }

  /** Calendar gap-fill + forward-fill (q99): a sparse daily gauge (max
    * order price per priority among rare big orders — ~12% day density)
    * regularized onto each key's full calendar span with the last
    * observation carried forward ([[graft.operators.Resample]]): in-row
    * `sequence` explode spine, one (key, date) left join, one per-key
    * window. */
  private def resampleQ(s: SparkSession, dir: String): DataFrame = {
    val obs = orders(s, dir)
      .where(col("o_totalprice") > 450000)
      .groupBy(col("o_orderpriority").as("pri"),
        col("o_orderdate").cast("date").as("d"))
      .agg(max(col("o_totalprice")).as("mx"))
    graft.operators.Resample.gapFillDaily(obs, Seq("pri"), "d", Seq("mx"))
      .orderBy("pri", "d")
  }

  /** Tukey IQR outlier screen (q100): exact per-type quartiles of
    * events.value through the bucket-refinement kernel, 1.5·IQR fences,
    * one counting pass ([[graft.operators.Profiling.iqrOutliers]]) — the
    * distribution-drift alarm a metrics pipeline runs per batch. */
  private def iqrOutliersQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.iqrOutliers(
      events(s, dir).select(col("event_type"), col("value")),
      "event_type", "value")

  /** Frequent co-purchase pairs (q101): A-priori pair mining over
    * (order, brand) baskets ([[graft.operators.Itemsets]]) — items
    * support-pruned BEFORE the pair self-join, the self-join reuses one
    * basket-keyed exchange, pair width bounded by per-basket frequent
    * items. */
  private def frequentPairsQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Itemsets.frequentPairs(
      lineitem(s, dir)
        .join(broadcast(part(s, dir)), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand")),
      "l_orderkey", "p_brand", minSupport = 350L)
      .orderBy("item_a", "item_b")

  /** Deterministic corpus split (q102): 80/10/10 train/val/test by integer
    * ppm thresholds over the portable salted md5-60 of doc_id
    * ([[graft.operators.Splits]]) — a per-row projection (zero shuffles)
    * whose assignment can never move when the corpus grows. */
  private def hashSplitQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Splits.hashSplit(
      documents(s, dir).select("doc_id", "lang"), "doc_id",
      Seq(("train", 800000L), ("val", 100000L), ("test", 100000L)))
      .orderBy("doc_id")

  /** Exact-sum Pearson + OLS slope (q103): quantity↔price co-movement per
    * return flag ([[graft.operators.Rollups.pearsonByKey]]) — co-moment
    * sums exact in the scaled-cents decimal domain, final r/slope a fixed
    * IEEE sequence, so the doubles replay bit-for-bit in DuckDB (its
    * native corr() would not: double accumulation order). */
  private def pearsonQ(s: SparkSession, dir: String): DataFrame =
    Rollups.pearsonByKey(lineitem(s, dir),
      "l_returnflag", "l_quantity", "l_extendedprice")
      .orderBy("l_returnflag")

  /** Chi-square contingency cells (q104): lang × source independence
    * decomposition over documents ([[graft.operators.Rollups.contingency]])
    * — one corpus shuffle to cell counts, marginals as cell-table windows,
    * expected/contribution as fixed per-cell IEEE ops (no float sums). */
  private def contingencyQ(s: SparkSession, dir: String): DataFrame =
    Rollups.contingency(documents(s, dir), "lang", "source")
      .orderBy("lang", "source")

  /** Blocked fuzzy resolve (q105): every truncated part name re-linked to
    * the full catalog through prefix-2 blocking + normalized Levenshtein
    * ([[graft.operators.FuzzyJoin]]) — the corpus-scale twin of q44's
    * broadcast fuzzy resolve; candidates never exceed the block. */
  private def blockedResolveQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.FuzzyJoin.blockedResolve(
      part(s, dir).select(
        expr("substring(p_name, 1, length(p_name) - 1)").as("probe")),
      "probe",
      part(s, dir).select("p_name"), "p_name",
      threshold = 0.5)
      .orderBy("q")

  /** Robust MAD outlier screen (q106): exact per-priority median of order
    * totals, exact median of absolute deviations (both through the
    * bucket-refinement kernel — no value buffering), Hampel fences
    * `med ± 3·MAD`, one counting pass
    * ([[graft.operators.Profiling.madOutliers]]) — the fat-tail-resistant
    * companion to q100's IQR fences. */
  private def madOutliersQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.madOutliers(
      orders(s, dir).select(col("o_orderpriority").as("pri"),
        col("o_totalprice").as("v")),
      "pri", "v")

  /** Sorted-neighborhood linkage (q107): two SNM passes over part names
    * (forward + reversed lowercased sort keys, prefix-2 blocks, w = 5),
    * union-distinct candidates, normalized-Levenshtein scoring at 0.6
    * ([[graft.operators.SortedNeighborhood]]) — the sliding-window
    * companion to q105's equality blocking; windows partition by block,
    * never the whole corpus. */
  private def sortedNeighborhoodQ(s: SparkSession, dir: String): DataFrame = {
    val p = part(s, dir).select(col("p_partkey"), col("p_name"))
    val passes = Seq(
      (lower(col("p_name")), substring(lower(col("p_name")), 1, 2)),
      (reverse(lower(col("p_name"))), substring(reverse(lower(col("p_name"))), 1, 2)))
    val cand = graft.operators.SortedNeighborhood
      .candidatesMultiPass(p, "p_partkey", passes, w = 5)
    graft.operators.SortedNeighborhood
      .scoredPairs(cand, p, "p_partkey", "p_name", threshold = 0.6)
      .orderBy("id_a", "id_b")
  }

  /** Zone-map pruning audit (q108): the same shipdate range predicate
    * costed under two layouts ([[graft.operators.Layout.pruningReport]])
    * — zones as orderkey buckets (the natural insert order: envelopes
    * span the whole date range, nothing prunes) vs zones as shipdate
    * months (date-clustered: only the predicate's months scan). The
    * planning-time I/O delta IS the value of clustered/Z-ordered writes;
    * rows_matched is identical by construction. */
  private def zoneMapQ(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    val li = lineitem(s, dir).select(col("l_orderkey").as("k"),
      col("l_shipdate").cast("date").as("d"))
    val lo = lit("1997-01-01").cast("date")
    val hi = lit("1997-03-31").cast("date")
    val natural = Layout.pruningReport(li,
      ((col("k") - pmod(col("k"), lit(1000L))) / lit(1000L)).cast("long"),
      col("d"), lo, hi)
      .select(lit("natural").as("layout"), col("*"))
    val clustered = Layout.pruningReport(li, trunc(col("d"), "month"),
      col("d"), lo, hi)
      .select(lit("by_month").as("layout"), col("*"))
    natural.unionByName(clustered).orderBy("layout")
  }

  /** Data-contract report (q109): the expectation suite over orders +
    * the lineitem→orders referential check
    * ([[graft.operators.Expectations]]) — a deliberate mix of passing and
    * failing checks (o_custkey repeats, P-status rows, out-of-range
    * totals, low-priority regex misses) so the report is exercised, not
    * vacuous. Row-local checks share ONE aggregate pass. */
  private def expectationsQ(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Expectations._
    val o = orders(s, dir)
    val ordersReport = report(o, Seq(
      NotNull("o_custkey"),
      Unique(Seq("o_orderkey")),
      Unique(Seq("o_custkey")),
      InRange("o_totalprice", lit(0.0), lit(450000.0)),
      InSet("o_orderstatus", Seq("F", "O")),
      Matches("o_orderpriority", "^[1-3]-")))
    val fkReport = report(lineitem(s, dir),
      Seq(ForeignKey("l_orderkey", o, "o_orderkey")))
    ordersReport.unionByName(fkReport).orderBy("check_name")
  }

  /** Token-weighted length quantiles (q110): per-language p50/p90 of doc
    * char length where each doc counts by its TOKEN count
    * ([[graft.operators.Profiling.weightedQuantilesByKey]]) — the
    * distributed cumulative-weight selection (no driver finalize, state
    * bounded by per-key distinct lengths); integer weights make the
    * lower-quantile definition engine-exact. */
  private def weightedQuantilesQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.weightedQuantilesByKey(
      documents(s, dir).select(col("lang"),
        TF.charCount(col("text")).as("len"),
        TF.tokenCount(col("text")).as("w")),
      "lang", "len", "w", Seq(0.5, 0.9))
      .orderBy("lang", "prob")

  /** Supplier activity coverage (q111): each shipment opens a 7-day
    * activity window; overlapping windows coalesce via the cummax sweep
    * ([[graft.operators.Windows.intervalUnion]]) and per-supplier
    * coverage is the DEDUP'd day count — the interval twin of q07's
    * gaps-and-islands, pure integer day arithmetic. */
  private def intervalUnionQ(s: SparkSession, dir: String): DataFrame = {
    val iv = lineitem(s, dir)
      .where(col("l_suppkey").isNotNull && col("l_shipdate").isNotNull)
      .select(col("l_suppkey"),
        datediff(col("l_shipdate").cast("date"),
          lit("1992-01-01").cast("date")).cast("long").as("s"))
      .withColumn("e", col("s") + lit(6L))
    graft.operators.Windows.intervalUnion(iv, Seq("l_suppkey"), "s", "e")
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_ranges"),
        sum(col("n_intervals")).as("n_merged"),
        sum(col("u_end") - col("u_start") + lit(1L)).as("covered_days"))
      .orderBy("l_suppkey")
  }

  /** Incremental sessionization (q112): events split at a time cut,
    * each half sessionized alone, fragments fused through the gap-sweep
    * ([[graft.operators.Sessionize]]) — under the ordered-batch contract
    * the fold telescopes to q54's one-shot session table, so this query
    * shares q54's oracle SQL verbatim (the same proof shape as q96). */
  private def sessionizeIncQ(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sessionize
    val ev = events(s, dir).withColumn("tus",
      floor(col("ts").cast("decimal(20,0)") / lit(1000)).cast("long"))
    val gapUs = 21600000000L // 6 hours
    val cut = lit(1705276800000000L) // 2024-01-15T00:00:00Z epoch µs
    val isPurchase = col("event_type") === "purchase"
    val half1 = Sessionize.sessionize(
      ev.filter(col("tus") < cut), "user_id", "tus", gapUs, isPurchase)
    val half2 = Sessionize.sessionize(
      ev.filter(col("tus") >= cut), "user_id", "tus", gapUs, isPurchase)
    Sessionize.updateSessionState(half1, half2, "user_id", gapUs)
      .withColumn("session_idx", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("session_start_us")))
        .cast("long"))
      .orderBy("user_id", "session_idx")
  }

  /** Prefix-filtered exact set-similarity self-join (q113): every document
    * pair with 3-gram shingle Jaccard >= 0.5, found via the PPJoin-style
    * rare-token-first prefix filter ([[graft.operators.SetSimilarity]])
    * instead of an all-pairs token join — the EXACT companion to q18's
    * probabilistic MinHash-LSH. The oracle is the brute-force pair join,
    * so the gate proves the prefix filter loses nothing. */
  private def setSimilarityQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.SetSimilarity.selfJoin(
      documents(s, dir), "doc_id", "text", threshold = 0.5, shingleSize = 3)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy("id_a", "id_b")

  /** EWMA control chart (q114): per-user fixed-point EWMA + EW mean
    * absolute deviation over the event stream, spikes where the one-step
    * residual exceeds `3·dev` ([[graft.operators.ControlChart]]) — the
    * genuinely recursive kernel a window can't express, shipped as ONE
    * shuffle + sortWithinPartitions + O(1)-state streaming fold. Integer
    * micro-scale arithmetic keeps it bit-exact against DuckDB's
    * recursive-CTE replay of the same recurrence. */
  private def ewmaChartQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.ControlChart.ewmaChart(
      events(s, dir).select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value") * lit(1e6)).cast("long").as("v")),
      Seq("user_id"), Seq("ts", "event_id"), "v")
      .select(col("user_id"), col("rn"), col("event_id"), col("v"),
        col("ewma"), col("dev"), col("resid"), col("is_spike"))
      .orderBy("user_id", "rn")

  /** Co-purchase triangle census (q115): parts that co-occur in >= 2
    * orders form an undirected graph; per-part triangle counts and local
    * clustering coefficients via degree-ordered orientation
    * ([[graft.operators.Triangles]]). The oracle brute-forces the
    * three-way join on the same edge list, so the gate proves the
    * orientation enumerates every triangle exactly once. */
  private def trianglesQ(s: SparkSession, dir: String): DataFrame = {
    val op = lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = op.toDF("o", "pa").join(op.toDF("o", "pb"), "o")
      .where(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("c"))
      .where(col("c") >= 2)
      .select("pa", "pb")
    graft.operators.Triangles.nodeTriangles(edges, "pa", "pb")
      .select(col("node").as("part"), col("degree"), col("triangles"),
        col("clustering"))
      .orderBy("part")
  }

  /** Brand-partition modularity (q230): Newman–Girvan modularity of the
    * `p_brand` community assignment over the part co-purchase graph (parts
    * co-ordered in ≥ 2 orders — the q115/q217/q219 edge harvest). One row
    * per community with the exact-integer ingredients (node count, degree
    * mass, within-community edges, total edges) plus the community's
    * contribution to Q = Σ_c [e_c/m − (D_c/2m)²], both as a deterministic
    * floor-ppm integer and as IEEE doubles derived from the exact counts.
    *
    * Scale shape: the pair harvest is the bounded per-order fanout join
    * (orders carry ≤ ~7 parts); everything downstream lives on the edge
    * grain (two dim joins, map-side-combined rollups) and the brand grain;
    * `m` arrives by lazy 1-row crossJoin, never a collect. The squared
    * degree-mass term runs in decimal(38,0) — D_c²·1e6 overflows long at
    * ~100× but is 23 digits at worst. */
  private def modularityQ(s: SparkSession, dir: String): DataFrame = {
    val op = lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = op.toDF("o", "pa").join(op.toDF("o", "pb"), "o")
      .where(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("c"))
      .where(col("c") >= 2)
      .select("pa", "pb")
    val brand = part(s, dir)
      .select(col("p_partkey").as("node"), col("p_brand").as("brand"))
    // the harvest feeds three different grains (brand-pair cells, node
    // distincts, the global edge count) — materialize it once instead of
    // re-running the order-pair self-join per consumer
    val eb = edges
      .join(brand.select(col("node").as("pa"), col("brand").as("ba")), "pa")
      .join(brand.select(col("node").as("pb"), col("brand").as("bb")), "pb")
      .localCheckpoint()
    // ONE edge-grain aggregate to the ≤|brands|² cell grain; degree mass,
    // within-edges and m are all tiny reads off it (an edge contributes its
    // count to ba's and bb's degree mass — same total as per-node degrees)
    val cells = eb.groupBy("ba", "bb").agg(count(lit(1)).as("c"))
    val degByBrand = cells.select(col("ba").as("brand"), col("c"))
      .unionByName(cells.select(col("bb").as("brand"), col("c")))
      .groupBy("brand").agg(sum(col("c")).as("degree_sum"))
    val nNodes = eb.select(col("pa").as("node"), col("ba").as("brand"))
      .unionByName(eb.select(col("pb").as("node"), col("bb").as("brand")))
      .distinct()
      .groupBy("brand").agg(count(lit(1)).as("n_nodes"))
    val byBrand = degByBrand.join(nNodes, Seq("brand"))
    val within = cells.where(col("ba") === col("bb"))
      .groupBy(col("ba").as("brand")).agg(sum(col("c")).as("within_edges"))
    val m = cells.agg(sum(col("c")).as("m_edges"))
    val d38 = "decimal(38,0)"
    byBrand.join(within, Seq("brand"), "left")
      .na.fill(0L, Seq("within_edges"))
      .crossJoin(m)
      .withColumn("__w6", col("within_edges") * lit(1000000L))
      .withColumn("__d6",
        col("degree_sum").cast(d38) * col("degree_sum").cast(d38) * lit(1000000L).cast(d38))
      .withColumn("__4m2",
        col("m_edges").cast(d38) * col("m_edges").cast(d38) * lit(4L).cast(d38))
      .withColumn("__dh", (col("degree_sum").cast("double") /
        (col("m_edges").cast("double") * lit(2.0))))
      .select(
        col("brand"), col("n_nodes"), col("degree_sum"),
        col("within_edges"), col("m_edges"),
        (((col("__w6") - pmod(col("__w6"), col("m_edges"))) / col("m_edges")).cast("long")
          - ((col("__d6") - pmod(col("__d6"), col("__4m2"))) / col("__4m2")).cast("long"))
          .as("contrib_ppm"),
        (col("within_edges").cast("double") / col("m_edges").cast("double")
          - col("__dh") * col("__dh")).as("contrib"))
      .orderBy("brand")
  }

  /** Train/heldout near-dup leakage audit (q231): the q18 MinHash
    * candidate pairs crossed with the deterministic md5 90/10 split (the
    * q36 hash law) — the eval-hygiene readout for how much near-duplicate
    * mass straddles a train/test split (train-side near-dups of held-out
    * docs inflate held-out metrics; Lee et al. 2022's contamination
    * argument at the near-dup grain). One summary row: pair counts by
    * side, the straddling fraction, and the fraction of held-out docs with
    * at least one train-side near-dup, all integer-exact with floor-ppm
    * rates. The split labels are two hash projections on the pair grain;
    * the rollup is one tiny agg — the corpus-scale work is q18's capped
    * band-bucket harvest, reused unchanged. */
  private def splitLeakageQ(s: SparkSession, dir: String): DataFrame = {
    def isTrain(c: Column): Column =
      pmod(PortableHash.md5Hash60(c), lit(1000000L)) < lit(900000L)
    // the pair table feeds two aggregates (side counts + distinct leaked
    // held docs); it is tiny (flood-capped harvest) — materialize it once
    // instead of re-running the signature/band pipeline per consumer
    val lab = Dedup.minhashCandidatePairs(documents(s, dir), "doc_id", "text",
      shingleSize = 2, numHashes = 32, rowsPerBand = 8, portable = true)
      .select(col("id_a"), col("id_b"),
        isTrain(col("id_a")).as("ta"), isTrain(col("id_b")).as("tb"))
      .localCheckpoint()
    val ag = lab.agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("ta") && col("tb"), lit(1L)).otherwise(lit(0L)))
        .as("n_train_train"),
      sum(when(!col("ta") && !col("tb"), lit(1L)).otherwise(lit(0L)))
        .as("n_held_held"),
      sum(when(col("ta") =!= col("tb"), lit(1L)).otherwise(lit(0L)))
        .as("n_cross"))
    val leaked = lab.where(col("ta") =!= col("tb"))
      .select(when(col("ta"), col("id_b")).otherwise(col("id_a")).as("h"))
      .agg(count_distinct(col("h")).as("n_held_docs_leaked"))
    val heldTotal = documents(s, dir)
      .where(!isTrain(col("doc_id")))
      .agg(count(lit(1)).as("n_held_docs"))
    def ppm(n: Column, d: Column): Column =
      when(d > 0L, ((n * lit(1000000L) - pmod(n * lit(1000000L), d)) / d)
        .cast("long")).otherwise(lit(0L))
    ag.crossJoin(leaked).crossJoin(heldTotal)
      .select(
        col("n_pairs"), col("n_train_train"), col("n_held_held"),
        col("n_cross"), col("n_held_docs_leaked"), col("n_held_docs"),
        ppm(col("n_cross"), col("n_pairs")).as("leak_ppm"),
        ppm(col("n_held_docs_leaked"), col("n_held_docs")).as("exposure_ppm"))
  }

  /** Signed-random-projection recall ablation (q232): Achlioptas/JL ±1
    * projection of the int8-quantized embeddings from 64 to {8,16,32}
    * dims ([[graft.operators.Similarity.signedProjection]], splitmix-
    * derived sign literals inlined in BOTH engines), then per probe and
    * per dim how much of the full-dimension quantized top-5 (the q48
    * chain) survives in the projected top-5 — the dimension-reduction
    * member of the ANN ablation family (q122 measures prefix truncation;
    * this measures a proper JL mix). Every product/sum through the
    * projection is an integer ≤ 64·127, so the projection is exact in any
    * summation order; the final cosines are IEEE ops over exact integers
    * — engine-identical. On this corpus the curve sits near zero at every
    * dim: the synthetic embeddings are isotropic, so top-k membership
    * among near-equidistant neighbors is unstable under ANY compression —
    * JL preserves pairwise distances, not the ranking of ties. That
    * collapse is the readout: it flags a corpus with no intrinsic
    * low-dimensional neighborhood structure BEFORE anyone ships a
    * cheapened index built on it. */
  private def jlRecallQ(s: SparkSession, dir: String): DataFrame = {
    val q = Similarity.quantizeInt8(embeddings(s, dir), "vec_id", "embedding")
    val full = Similarity
      .bruteForceTopKQuantized(q, q.filter(col("vec_id") < 10), "vec_id", 5)
      .select(col("query_id"), col("neighbor_id"))
    Seq(8, 16, 32).map { d =>
      val pq = Similarity.signedProjection(q, "vec_id", "qvec",
        Similarity.jlSigns(d, 64))
      val proj = Similarity
        .bruteForceTopKQuantized(pq, pq.filter(col("vec_id") < 10), "vec_id", 5)
        .select(col("query_id"), col("neighbor_id"))
      full.join(proj.withColumn("__hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_overlap"))
        .select(col("query_id"), lit(d).as("dim"), col("n_overlap"),
          (col("n_overlap").cast("double") / 5).as("recall"))
    }.reduce(_ unionByName _)
      .orderBy("query_id", "dim")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_pivot" -> (pricingPivot _),
    "q02_region_revenue" -> (regionRevenue _),
    "q03_effective_status" -> (effectiveStatus _),
    "q04_union_daily" -> (unionDaily _),
    "q05_trailing7" -> (trailing7 _),
    "q06_anomaly_baseline" -> (anomalyBaseline _),
    "q07_gaps_islands" -> (gapsIslands _),
    "q08_latest_dedup" -> (latestDedup _),
    "q09_top3_names" -> (top3Names _),
    "q10_screen_top_spenders" -> (screenTopSpenders _),
    "q11_median_price" -> (medianPrice _),
    "q12_pagination" -> (pagination _),
    "q13_token_stats" -> (tokenStats _),
    "q14_doc_fingerprint" -> (docFingerprint _),
    "q15_lang_id" -> (langId _),
    "q16_cosine_knn" -> (cosineKnn _),
    "q17_cosine_ivf" -> (cosineIvf _),
    "q18_minhash_pairs" -> (minhashPairs _),
    "q19_simhash" -> (simhashTable _),
    "q20_active_propagation" -> (activePropagation _),
    "q21_trailing_streak" -> (trailingStreak _),
    "q22_lag_delta" -> (lagDelta _),
    "q23_anchored_weekly" -> (anchoredWeekly _),
    "q24_pipe_series" -> (pipeSeries _),
    "q25_semi_join_scope" -> (semiJoinScope _),
    "q26_sector_baseline" -> (sectorBaseline _),
    "q27_index_rollup" -> (indexRollup _),
    "q28_topk_composite" -> (topkComposite _),
    "q29_narrative_rollup" -> (narrativeRollup _),
    "q30_control_classify" -> (controlClassify _),
    "q31_fuzzy_resolve" -> (fuzzyResolve _),
    "q32_multimodal_decode" -> (multimodalDecode _),
    "q33_embedding_neardup" -> (embeddingNearDup _),
    "q34_signal_score" -> (signalScore _),
    "q35_distinct_users" -> (distinctUsers _),
    "q36_random_sample" -> (randomSample _),
    "q37_evidence_histogram" -> (evidenceHistogram _),
    "q38_storyline_scores" -> (storylineScores _),
    "q39_lang_confusion" -> (langConfusion _),
    "q40_jaccard_verify" -> (jaccardVerify _),
    "q41_quality_score" -> (qualityScore _),
    "q42_repetition_stats" -> (repetitionStats _),
    "q43_simhash_pairs" -> (simhashPairsQ _),
    "q44_fuzzy_resolve_lev" -> (fuzzyResolveLev _),
    "q45_sector_baseline_rows" -> (sectorBaselineRows _),
    "q46_crisis_patterns" -> (crisisPatterns _),
    "q47_dedup_groups" -> (dedupGroups _),
    "q48_quantized_knn" -> (quantizedKnn _),
    "q49_chunking" -> (chunkDocs _),
    "q50_packing" -> (packDocs _),
    "q51_stratified_sample" -> (stratifiedSample _),
    "q52_asof_join" -> (asofJoinQ _),
    "q53_range_join" -> (rangeJoinQ _),
    "q54_sessionize" -> (sessionizeQ _),
    "q55_scd2_intervals" -> (scd2Q _),
    "q56_bm25_topk" -> (bm25Q _),
    "q57_profile" -> (profileQ _),
    "q58_vocab" -> (vocabQ _),
    "q59_contamination" -> (contaminationQ _),
    "q60_incremental_dedup" -> (incrementalDedupQ _),
    "q61_pii_scrub" -> (piiScrubQ _),
    "q62_quality_gate" -> (qualityGateQ _),
    "q63_domain_mix" -> (domainMixQ _),
    "q64_per_key_sample" -> (perKeySample _),
    "q65_incremental_exact" -> (incrementalExactQ _),
    "q66_bpe_tokens" -> (bpeTokensQ _),
    "q67_semantic_dedup" -> (semanticDedupQ _),
    "q68_dup_spans" -> (dupSpansQ _),
    "q69_keywords" -> (keywordsQ _),
    "q70_epoch_shards" -> (epochShardsQ _),
    "q71_weighted_sample" -> (weightedSampleQ _),
    "q72_token_ids" -> (tokenIdsQ _),
    "q73_length_batches" -> (lengthBatchesQ _),
    "q74_dup_spans_inc" -> (dupSpansIncQ _),
    "q75_interval_overlap" -> (intervalOverlapQ _),
    "q76_curation_gate" -> (curationGateQ _),
    "q77_quality_deciles" -> (qualityDecilesQ _),
    "q78_cdc_chunks" -> (cdcChunksQ _),
    "q79_chunk_dedup" -> (chunkDedupQ _),
    "q80_zorder_layout" -> (zorderLayoutQ _),
    "q81_gram_matrix" -> (gramQ _),
    "q82_profile_cat" -> (profileCatQ _),
    "q83_join_size" -> (joinSizeQ _),
    "q84_asof_forward" -> (asofForwardQ _),
    "q85_dup_span_ranges" -> (dupSpanRangesQ _),
    "q86_minhash_stats" -> (minhashStatsQ _),
    "q87_cut_spans" -> (cutSpansQ _),
    "q88_bpe_pairs" -> (bpePairsQ _),
    "q89_gopher_rules" -> (gopherRulesQ _),
    "q90_funnel" -> (funnelQ _),
    "q91_retention" -> (retentionQ _),
    "q92_heavy_hitters" -> (heavyHittersQ _),
    "q93_vocab_coverage" -> (vocabCoverageQ _),
    "q94_transitions" -> (transitionsQ _),
    "q95_rfm" -> (rfmQ _),
    "q96_funnel_inc" -> (funnelIncQ _),
    "q97_bloom_prune" -> (bloomPruneQ _),
    "q98_table_diff" -> (tableDiffQ _),
    "q99_gap_fill" -> (resampleQ _),
    "q100_iqr_outliers" -> (iqrOutliersQ _),
    "q101_frequent_pairs" -> (frequentPairsQ _),
    "q102_hash_split" -> (hashSplitQ _),
    "q103_pearson" -> (pearsonQ _),
    "q104_contingency" -> (contingencyQ _),
    "q105_blocked_resolve" -> (blockedResolveQ _),
    "q106_mad_outliers" -> (madOutliersQ _),
    "q107_sorted_neighborhood" -> (sortedNeighborhoodQ _),
    "q108_zone_map" -> (zoneMapQ _),
    "q109_expectations" -> (expectationsQ _),
    "q110_weighted_quantiles" -> (weightedQuantilesQ _),
    "q111_interval_union" -> (intervalUnionQ _),
    "q112_sessionize_inc" -> (sessionizeIncQ _),
    "q113_set_similarity" -> (setSimilarityQ _),
    "q114_ewma_chart" -> (ewmaChartQ _),
    "q115_triangles" -> (trianglesQ _),
    "q116_sa_dup_ranges" -> (saDupRangesQ _),
    "q117_collocations" -> (collocationsQ _),
    "q118_group_split" -> (groupSplitQ _),
    "q119_hybrid_rrf" -> (hybridRrfQ _),
    "q120_pagerank" -> (pageRankQ _),
    "q121_skipgram" -> (skipgramQ _),
    "q122_trunc_recall" -> (truncationRecallQ _),
    "q123_lm_familiarity" -> (lmFamiliarityQ _),
    "q124_dsir_weights" -> (dsirWeightsQ _),
    "q125_sliding_distinct" -> (slidingDistinctQ _),
    "q126_k_anonymity" -> (kAnonymityQ _),
    "q127_containment" -> (containmentJoinQ _),
    "q128_lsh_recall" -> (lshRecallQ _),
    "q129_sliding_distinct_inc" -> (slidingDistinctIncQ _),
    "q130_pq_recall" -> (pqRecallQ _),
    "q131_mutual_knn" -> (mutualKnnQ _),
    "q132_ivf_pq_recall" -> (ivfPqRecallQ _),
    "q133_knn_clusters" -> (knnClustersQ _),
    "q134_lexical_profile" -> (lexicalProfileQ _),
    "q135_attribution" -> (attributionQ _),
    "q136_dup_matrix" -> (dupMatrixQ _),
    "q137_temperature_mix" -> (temperatureMixQ _),
    "q138_semantic_decon" -> (semanticDeconQ _),
    "q139_label_prop" -> (labelPropQ _),
    "q140_tv_drift" -> (tvDriftQ _),
    "q141_ngram_novelty" -> (ngramNoveltyQ _),
    "q142_dedup_roi" -> (dedupRoiQ _),
    "q143_packing_efficiency" -> (packingEfficiencyQ _),
    "q144_skew_audit" -> (skewAuditQ _),
    "q145_simpson" -> (simpsonQ _),
    "q146_rbo" -> (rboQ _),
    "q147_shard_stability" -> (shardStabilityQ _),
    "q148_persistent_hitters" -> (persistentHittersQ _),
    "q149_source_jaccard" -> (sourceJaccardQ _),
    "q150_length_gini" -> (lengthGiniQ _),
    "q151_winnow_density" -> (winnowDensityQ _),
    "q152_winnow_pairs" -> (winnowPairsQ _),
    "q153_gate_kappa" -> (gateKappaQ _),
    "q154_length_auc" -> (lengthAucQ _),
    "q155_ks_drift" -> (ksDriftQ _),
    "q156_spearman" -> (spearmanQ _),
    "q157_benford" -> (benfordQ _),
    "q158_max_concurrency" -> (maxConcurrencyQ _),
    "q159_salted_join" -> (saltedJoinQ _),
    "q160_hilbert_locality" -> (hilbertLocalityQ _),
    "q161_gate_calibration" -> (gateCalibrationQ _),
    "q162_lsh_precision" -> (lshPrecisionQ _),
    "q163_quality_keeper" -> (qualityKeeperQ _),
    "q164_percentile_normalize" -> (percentileNormalizeQ _),
    "q165_zipf_segments" -> (zipfSegmentsQ _),
    "q166_item_cosine" -> (itemCosineQ _),
    "q167_repurchase_curve" -> (repurchaseCurveQ _),
    "q168_ks_two_sample" -> (ksTwoSampleQ _),
    "q169_minhash_calibration" -> (minhashCalibrationQ _),
    "q170_lateness_audit" -> (latenessAuditQ _),
    "q171_mutual_knn_ivf" -> (mutualKnnIvfQ _),
    "q172_kcenter_coreset" -> (kcenterQ _),
    "q173_isotonic_calibration" -> (isotonicCalQ _),
    "q174_golden_record" -> (goldenRecordQ _),
    "q175_knn_label_purity" -> (knnLabelPurityQ _),
    "q176_set_cover" -> (setCoverQ _),
    "q177_seq_trigrams" -> (seqTrigramsQ _),
    "q178_cuped" -> (cupedQ _),
    "q179_l_diversity" -> (lDiversityQ _),
    "q180_seasonal_anomaly" -> (seasonalAnomalyQ _),
    "q181_common_neighbors" -> (commonNeighborsQ _),
    "q182_aswas_asis" -> (asWasAsIsQ _),
    "q183_profile_store" -> (profileStoreQ _),
    "q184_coreset_drift" -> (coresetDriftQ _),
    "q185_tree_scoring" -> (treeScoringQ _),
    "q186_hashed_linear" -> (hashedLinearQ _),
    "q187_target_encoding" -> (targetEncodingQ _),
    "q188_rle_audit" -> (rleAuditQ _),
    "q189_bloom_fpr" -> (bloomFprQ _),
    "q190_checksum_reconcile" -> (reconcileQ _),
    "q191_view_maintenance" -> (viewMaintenanceQ _),
    "q192_join_estimate" -> (joinEstimateQ _),
    "q193_cube_rollup" -> (cubeRollupQ _),
    "q194_generalization_ladder" -> (generalizationLadderQ _),
    "q195_rare_transitions" -> (rareTransitionsQ _),
    "q196_growth_accounting" -> (growthAccountingQ _),
    "q197_stickiness" -> (stickinessQ _),
    "q198_srm_check" -> (srmCheckQ _),
    "q199_funnel_ab" -> (funnelAbQ _),
    "q200_makespan_balance" -> (makespanQ _),
    "q201_index_advisor" -> (indexAdvisorQ _),
    "q202_token_forecast" -> (tokenForecastQ _),
    "q203_cluster_silhouette" -> (clusterSilhouetteQ _),
    "q204_watermark_planner" -> (watermarkPlannerQ _),
    "q205_did_readout" -> (didQ _),
    "q206_seasonal_strength" -> (seasonalStrengthQ _),
    "q207_forecast_bands" -> (forecastBandsQ _),
    "q208_max_dup_substring" -> (maxDupSubstringQ _),
    "q209_pca_power" -> (pcaPowerQ _),
    "q210_pca_scores" -> (pcaScoresQ _),
    "q211_bootstrap_ci" -> (bootstrapCiQ _),
    "q212_skyline" -> (skylineQ _),
    "q213_token_phi" -> (tokenPhiQ _),
    "q214_hits" -> (hitsQ _),
    "q215_mmr_select" -> (mmrQ _),
    "q216_ppr" -> (pprQ _),
    "q217_assortativity" -> (assortativityQ _),
    "q218_kmeans_lloyd" -> (kmeansQ _),
    "q219_single_linkage" -> (singleLinkageQ _),
    "q220_bfs_layers" -> (bfsLayersQ _),
    "q221_matching_att" -> (matchingAttQ _),
    "q222_hdbscan_profile" -> (hdbscanProfileQ _),
    "q223_heaps_curve" -> (heapsCurveQ _),
    "q224_clustering_coeff" -> (clusteringCoeffQ _),
    "q225_stratified_ate" -> (stratifiedAteQ _),
    "q226_km_risk_table" -> (kmRiskTableQ _),
    "q227_conformal_coverage" -> (conformalCoverageQ _),
    "q228_cusum_change" -> (cusumQ _),
    "q229_phash_neardup" -> (phashNearDupQ _),
    "q230_modularity" -> (modularityQ _),
    "q231_split_leakage" -> (splitLeakageQ _),
    "q232_jl_recall" -> (jlRecallQ _)
  )

  /** shared langid scoring subquery SQL (q15 / q39) */
  private lazy val langIdSql: String = {
    def hits(w: String) =
      s"CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' $w ', ' '))) / ${w.length + 1} AS BIGINT)"
    def langHits(ws: Seq[String]) = ws.map(hits).mkString(" + ")
    val en = langHits(Seq("the", "and", "of"))
    val es = langHits(Seq("el", "la", "de"))
    val de = langHits(Seq("der", "und", "die"))
    s"""SELECT doc_id, lang, en_hits, es_hits, de_hits,
       |  CASE WHEN es_hits > en_hits AND es_hits >= de_hits THEN 'es'
       |       WHEN de_hits > en_hits AND de_hits > es_hits THEN 'de'
       |       ELSE 'en' END AS predicted_lang
       |FROM (SELECT doc_id, lang, $en AS en_hits, $es AS es_hits, $de AS de_hits
       |      FROM documents)""".stripMargin
  }

  /** Full q89 Gopher-rules SELECT minus presentation sort (feeds q89 and
    * the q153 agreement oracle). */
  private lazy val gopherRulesSql: String =
    """WITH d AS (
      |  SELECT doc_id, text,
      |    string_split_regex(trim(lower(text)), '\s+') AS tk
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(tk) AS BIGINT) AS n_words,
      |    CAST(length(array_to_string(tk, '')) AS DOUBLE) / len(tk) AS mean_word_len,
      |    CAST(CAST((length(text) - length(replace(text, '#', ''))) / 1 AS BIGINT)
      |       + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT)
      |       AS DOUBLE) / len(tk) AS symbol_ratio,
      |    CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
      |      / len(tk) AS alpha_frac,
      |    CAST((SELECT SUM((length(p) - length(replace(p, ' ' || w || ' ', '')))
      |                     // (length(w) + 2))
      |          FROM (SELECT ' ' || array_to_string(tk, ' ') || ' ' AS p),
      |               unnest(['the','be','to','of','and','that','have','with']) AS s(w))
      |      AS BIGINT) AS stop_hits
      |  FROM d)
      |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, stop_hits,
      |  n_words >= 50 AND n_words <= 100000 AS words_ok,
      |  mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS word_len_ok,
      |  symbol_ratio <= 0.1 AS symbol_ok,
      |  alpha_frac >= 0.8 AS alpha_ok,
      |  stop_hits >= 2 AS stop_ok,
      |  (n_words >= 50 AND n_words <= 100000)
      |    AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
      |    AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8 AND stop_hits >= 2
      |    AS pass
      |FROM m""".stripMargin

  /** Full q76 curation-gate SELECT minus presentation sort (feeds q76 and
    * the q153/q154 gate-diagnostic oracles). */
  private lazy val curationGateSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |  FROM documents),
       |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
       |uni AS (SELECT doc_id, SUM(c) AS n_tokens, MAX(c) AS top_token_count
       |        FROM tc GROUP BY 1),
       |d2 AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
       |       FROM documents),
       |bg0 AS (
       |  SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg
       |  FROM d2, unnest(generate_series(1, greatest(len(w) - 1, 1))) AS u(i)
       |  WHERE len(w) >= 2
       |  UNION ALL
       |  SELECT doc_id, array_to_string(w, ' ') FROM d2 WHERE len(w) < 2),
       |bc AS (SELECT doc_id, bg, count(*) AS c FROM bg0 GROUP BY 1, 2),
       |bi AS (SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bigram_count
       |       FROM bc GROUP BY 1),
       |rep AS (
       |  SELECT doc_id,
       |    (CAST(top_token_count AS DOUBLE) / n_tokens > CAST(0.1 AS DOUBLE)
       |     OR CAST(top_bigram_count AS DOUBLE) / n_bigrams > CAST(0.05 AS DOUBLE))
       |      AS repetitive
       |  FROM uni JOIN bi USING (doc_id)),
       |lid AS (SELECT doc_id, predicted_lang = lang AS lang_match
       |        FROM ($langIdSql)),
       |dd AS (SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars
       |       FROM documents),
       |th AS (SELECT lang, quantile_cont(n_chars, 0.25) AS p25 FROM dd GROUP BY lang),
       |len AS (SELECT doc_id, n_chars >= p25 AS length_ok
       |        FROM dd JOIN th USING (lang))
       |SELECT doc_id, repetitive, lang_match, length_ok,
       |  (NOT repetitive AND lang_match AND length_ok) AS keep
       |FROM rep JOIN lid USING (doc_id) JOIN len USING (doc_id)""".stripMargin

  /** Shared winnowing CTE chain (k=4, w=4): per-doc token lists `d`, gram
    * hashes `g`, the rightmost-min window encoding `w`, and the selected
    * fingerprint set `sel(doc_id, mc)` with `mc = hash·10⁹ + (10⁹−1−pos)`
    * — HUGEINT-exact replay of `operators/Winnowing` (feeds q151/q152). */
  private lazy val winnowSelCte: String = {
    val gramHash = PortableHash.md5Hash60Sql("array_to_string(t[i:i+3], ' ')")
    s"""d AS (SELECT doc_id, source,
       |        string_split_regex(trim(lower(text)), '\\s+') AS t
       |      FROM documents),
       |g AS (SELECT doc_id, i AS p, $gramHash AS h
       |      FROM d, unnest(generate_series(1, len(t) - 3)) AS u(i)
       |      WHERE len(t) >= 4),
       |w AS (SELECT doc_id, p,
       |        min(CAST(h AS HUGEINT) * 1000000000 + (999999999 - p))
       |          OVER (PARTITION BY doc_id ORDER BY p
       |                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mc,
       |        row_number() OVER (PARTITION BY doc_id ORDER BY p) AS j,
       |        count(*) OVER (PARTITION BY doc_id) AS gc
       |      FROM g),
       |sel AS (SELECT DISTINCT doc_id, mc FROM w WHERE j <= greatest(gc - 3, 1))""".stripMargin
  }

  /** Shared CTE body replaying the portable minhash pipeline in DuckDB SQL —
    * md5Hash60 shingle hashes, 32 affine permutations, band CSV keys, the
    * (2, maxBucket) bucket-size gate (feeds q18 and q47). */
  private lazy val minhashPipelineCte: String = {
    val n = 32; val rpb = 8; val bands = n / rpb
    val mins = (0 until n)
      .map(i => s"min(${PortableHash.affine31Sql(i, "h")}) AS m$i").mkString(",\n    ")
    val sigList = (0 until n).map(i => s"m$i").mkString(", ")
    val bandSelects = (0 until bands).map { b =>
      val csv = (0 until rpb).map(r => s"m${b * rpb + r}").mkString(", ")
      s"SELECT id, [$sigList] AS sig, $b AS bno, concat_ws(',', $csv) AS bk FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""toks AS (
       |  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |sh AS (
       |  SELECT id, array_to_string(tk[u.i + 1 : u.i + 2], ' ') AS s
       |  FROM toks, unnest(range(greatest(len(tk) - 1, 1))) AS u(i)),
       |h AS (SELECT id, ${PortableHash.md5Hash60Sql("s")} AS h FROM sh),
       |sig AS (SELECT id, $mins FROM h GROUP BY id),
       |banded AS (
       |  $bandSelects),
       |sized AS (SELECT *, COUNT(*) OVER (PARTITION BY bno, bk) AS bsz FROM banded)""".stripMargin
  }

  /** q128 oracle: the q18 signature pipeline generalized over
    * rows-per-band (4/8/16 → 8/4/2 bands over the same 32 permutations),
    * composed with q113's brute-force truth at 3-gram Jaccard >= 0.7 —
    * the oracle shares the hash family with the Spark side (that IS the
    * replay guarantee) but derives truth and recall independently. */
  private lazy val lshRecallOracleSql: String = {
    val n = 32
    val mins = (0 until n)
      .map(i => s"min(${PortableHash.affine31Sql(i, "h")}) AS m$i")
      .mkString(",\n    ")
    def bandCtes(rpb: Int): String = {
      val bands = n / rpb
      val bandSelects = (0 until bands).map { b =>
        val csv = (b * rpb until (b + 1) * rpb).map(r => s"m$r").mkString(", ")
        s"SELECT id, $b AS bno, concat_ws(',', $csv) AS bk FROM sig"
      }.mkString("\n  UNION ALL\n  ")
      s"""banded$rpb AS (
         |  $bandSelects),
         |sized$rpb AS (
         |  SELECT *, COUNT(*) OVER (PARTITION BY bno, bk) AS bsz
         |  FROM banded$rpb),
         |cand$rpb AS (
         |  SELECT DISTINCT a.id AS ia, b.id AS ib
         |  FROM sized$rpb a JOIN sized$rpb b
         |    ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
         |  WHERE a.bsz BETWEEN 2 AND 1000)""".stripMargin
    }
    val per = Seq(4, 8, 16).map(bandCtes).mkString(",\n")
    val stats = Seq(4, 8, 16).map { rpb =>
      s"""SELECT $rpb AS rpb, ${n / rpb} AS nbands,
         |  (SELECT COUNT(*) FROM truth) AS n_true,
         |  (SELECT COUNT(*) FROM cand$rpb) AS n_candidates,
         |  (SELECT COUNT(*) FROM cand$rpb c
         |   JOIN truth t ON t.ia = c.ia AND t.ib = c.ib) AS n_caught"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH toks AS (
       |  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |sh AS (
       |  SELECT id, array_to_string(tk[u.i + 1 : u.i + 3], ' ') AS s
       |  FROM toks, unnest(range(greatest(len(tk) - 2, 1))) AS u(i)),
       |h AS (SELECT id, ${PortableHash.md5Hash60Sql("s")} AS h FROM sh),
       |sig AS (SELECT id, $mins FROM h GROUP BY id),
       |shd AS (SELECT DISTINCT id, s FROM sh),
       |counts AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM shd GROUP BY 1),
       |inter AS (
       |  SELECT a.id AS ia, b.id AS ib, CAST(count(*) AS BIGINT) AS m
       |  FROM shd a JOIN shd b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2),
       |truth AS (
       |  SELECT ia, ib FROM inter
       |  JOIN counts ca ON ca.id = ia JOIN counts cb ON cb.id = ib
       |  WHERE CAST(m AS DOUBLE) / (ca.n + cb.n - m) >= CAST(0.7 AS DOUBLE)),
       |$per
       |SELECT CAST(rpb AS BIGINT) AS rows_per_band,
       |  CAST(nbands AS BIGINT) AS bands,
       |  CAST(n_true AS BIGINT) AS n_true,
       |  CAST(n_candidates AS BIGINT) AS n_candidates,
       |  CAST(n_caught AS BIGINT) AS n_caught,
       |  CAST(n_caught AS DOUBLE) / n_true AS recall
       |FROM ($stats) ORDER BY rows_per_band""".stripMargin
  }

  /** q130/q132 oracles: full PQ replay — per-subspace squared distances
    * as the same left-associated 8-term chains, code assignment by
    * (dist, cid) row_number, ADC as the same left-associated lookup sum,
    * recall vs the exact cosine top-5 (q122's fullk pattern). With
    * `ivf = true` the ADC scan is additionally routed through q17's cell
    * assignment/probing CTEs (cosine argmax, nprobe = 4 of 16). */
  private lazy val pqRecallOracleSql: String = pqOracle(ivf = false)
  private lazy val ivfPqRecallOracleSql: String = pqOracle(ivf = true)
  private def pqOracle(ivf: Boolean): String = {
    val m = 8; val sub = 8; val kk = 16; val k = 5
    def dist(v: String, c: String, mi: Int): String =
      (0 until sub).map { j =>
        val i = mi * sub + j + 1
        s"(CAST($v[$i] AS DOUBLE) - CAST($c[$i] AS DOUBLE)) * " +
          s"(CAST($v[$i] AS DOUBLE) - CAST($c[$i] AS DOUBLE))"
      }.mkString(" + ")
    val cdCols = (0 until m).map(mi => s"${dist("e.embedding", "c.cvec", mi)} AS d$mi").mkString(",\n    ")
    val codeCtes = (0 until m).map { mi =>
      s"""codes_$mi AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d$mi, cid) AS rn FROM cd)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val codeJoin = (1 until m)
      .map(mi => s"JOIN codes_$mi c$mi USING (vec_id)").mkString("\n  ")
    val codeSel = (0 until m).map(mi => s"c$mi.cid AS c$mi").mkString(", ")
    val dtCols = (0 until m).map(mi => s"${dist("q.embedding", "c.cvec", mi)} AS dq$mi").mkString(",\n    ")
    // pivot dt to one row per query (cid-ordered lookup arrays) BEFORE the
    // ADC join — a naive 8-way chained join on (cid, qid) hands the
    // planner a 16^7-per-query reorder trap
    val dtqCols = (0 until m)
      .map(mi => s"array_agg(dq$mi ORDER BY cid) AS a$mi").mkString(",\n    ")
    val adSum = (0 until m).map(mi => s"t.a$mi[x.c$mi + 1]").mkString(" + ")
    val ivfCtes = if (!ivf) "" else
      s"""icents AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id,
         |    embedding AS cent
         |  FROM embeddings ORDER BY vec_id LIMIT 16),
         |bucketed AS (
         |  SELECT nid, cent_id AS bucket FROM (
         |    SELECT e.vec_id AS nid, c.cent_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_cosine_similarity(e.embedding, c.cent)
         |          DESC, c.cent_id) AS r
         |    FROM embeddings e, icents c) WHERE r = 1),
         |iprobes AS (
         |  SELECT qid, bucket FROM (
         |    SELECT e.vec_id AS qid, c.cent_id AS bucket,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_cosine_similarity(e.embedding, c.cent)
         |          DESC, c.cent_id) AS r
         |    FROM embeddings e, icents c WHERE e.vec_id < 10) t
         |  WHERE r <= 4),
         |""".stripMargin
    val adFrom = if (!ivf)
      "FROM codes x CROSS JOIN dtq t"
    else
      """FROM codes x
        |  JOIN bucketed bk ON bk.nid = x.vec_id
        |  JOIN iprobes p ON p.bucket = bk.bucket
        |  JOIN dtq t ON t.qid = p.qid""".stripMargin
    s"""WITH ${ivfCtes}cents AS (
       |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
       |  WHERE vec_id < $kk),
       |cd AS (
       |  SELECT e.vec_id, c.cid,
       |    $cdCols
       |  FROM embeddings e CROSS JOIN cents c),
       |$codeCtes,
       |codes AS (
       |  SELECT vec_id, $codeSel FROM codes_0 c0
       |  $codeJoin),
       |dt AS (
       |  SELECT q.vec_id AS qid, c.cid,
       |    $dtCols
       |  FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 10),
       |dtq AS (
       |  SELECT qid,
       |    $dtqCols
       |  FROM dt GROUP BY qid),
       |ad AS (
       |  SELECT t.qid AS query_id, x.vec_id AS neighbor_id,
       |    $adSum AS adist
       |  $adFrom
       |  WHERE x.vec_id <> t.qid),
       |pqtop AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY adist, neighbor_id) AS rn
       |    FROM ad) WHERE rn <= $k),
       |fullk AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.embedding, c.embedding)
       |          DESC, c.vec_id) AS r
       |    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id < 10) z WHERE r <= $k)
       |SELECT f.query_id,
       |  CAST(SUM(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_overlap,
       |  CAST(SUM(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS DOUBLE) / $k AS recall
       |FROM fullk f LEFT JOIN pqtop p
       |  ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id
       |GROUP BY f.query_id ORDER BY f.query_id""".stripMargin
  }

  /** q125 + q129 shared oracle: the one-shot trailing-7-day distinct
    * series (the incremental update must be indistinguishable from it). */
  private lazy val slidingDistinctOracleSql: String =
    """WITH e AS (
      |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS d, user_id
      |  FROM events),
      |b AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
      |w AS (
      |  SELECT DISTINCT d + i AS wd, user_id
      |  FROM e, unnest(generate_series(0, 6)) AS u(i))
      |SELECT CAST(w.wd AS BIGINT) AS day,
      |  CAST(COUNT(*) AS BIGINT) AS n_active
      |FROM w, b WHERE w.wd BETWEEN b.lo AND b.hi
      |GROUP BY w.wd ORDER BY day""".stripMargin

  /** q90 + q96 shared oracle: the full-data greedy funnel (q96's
    * incremental fold must be indistinguishable from it). */
  /** q54/q112 shared oracle: one-shot sessionization (the incremental
    * fold must hash-match it exactly). */
  private lazy val sessionOracleSql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_type,
      |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pd
      |  FROM events),
      |g AS (
      |  SELECT user_id, ts, event_type,
      |    SUM(CASE WHEN pd IS NULL
      |             OR date_diff('microsecond', pd, ts) >= 21600000000
      |             THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM e),
      |s AS (
      |  SELECT user_id,
      |    epoch_us(MIN(ts)) AS session_start_us,
      |    epoch_us(MAX(ts)) AS session_end_us,
      |    CAST(COUNT(*) AS BIGINT) AS n_events,
      |    CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
      |      AS n_purchases
      |  FROM g GROUP BY user_id, sid)
      |SELECT user_id, session_start_us, session_end_us, n_events, n_purchases,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY session_start_us)
      |    AS BIGINT) AS session_idx
      |FROM s ORDER BY user_id, session_idx""".stripMargin

  private lazy val funnelOracleSql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t, event_type
      |  FROM events),
      |s1 AS (
      |  SELECT user_id, MIN(t) AS t1 FROM ev
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, MIN(e.t) AS t2
      |  FROM ev e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.t > s1.t1 GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, MIN(e.t) AS t3
      |  FROM ev e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.t > s2.t2 GROUP BY e.user_id),
      |u AS (SELECT DISTINCT user_id FROM ev)
      |SELECT u.user_id, t1 AS t1_us, t2 AS t2_us, t3 AS t3_us,
      |  CAST(CASE WHEN t3 IS NOT NULL THEN 3
      |            WHEN t2 IS NOT NULL THEN 2
      |            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
      |    AS steps_completed
      |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
      |  LEFT JOIN s3 USING (user_id)
      |ORDER BY user_id""".stripMargin

  private lazy val minhashOracleSql: String = {
    val estJ = (0 until 32)
      .map(i => s"CASE WHEN a.sig[${i + 1}] = b.sig[${i + 1}] THEN 1 ELSE 0 END")
      .mkString("\n    + ")
    s"""WITH $minhashPipelineCte
       |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |  CAST($estJ AS DOUBLE) / 32.0 AS est_jaccard
       |FROM sized a JOIN sized b ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
       |WHERE a.bsz BETWEEN 2 AND 1000
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q60 oracle: the same full signature/band/bucket pipeline as q18, with
    * pairs restricted to at-least-one-batch-side (doc_id % 10 == 0) — the
    * definitional check that the incremental probe emits exactly
    * `pairs(store ∪ batch)` minus the store-only pairs. */
  private lazy val incrementalDedupOracleSql: String = {
    val estJ = (0 until 32)
      .map(i => s"CASE WHEN a.sig[${i + 1}] = b.sig[${i + 1}] THEN 1 ELSE 0 END")
      .mkString("\n    + ")
    s"""WITH $minhashPipelineCte
       |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |  CAST($estJ AS DOUBLE) / 32.0 AS est_jaccard
       |FROM sized a JOIN sized b ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
       |WHERE a.bsz BETWEEN 2 AND 1000
       |  AND (a.id % 10 = 0 OR b.id % 10 = 0)
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q47 oracle: minhash pairs -> connected components via a recursive CTE
    * (min reachable id per node == the distributed label propagation). */
  private lazy val dedupGroupsOracleSql: String =
    s"""WITH RECURSIVE $minhashPipelineCte,
       |mpairs AS (
       |  SELECT DISTINCT a.id AS ia, b.id AS ib
       |  FROM sized a JOIN sized b ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
       |  WHERE a.bsz BETWEEN 2 AND 1000),
       |edges AS (SELECT ia AS a, ib AS b FROM mpairs UNION SELECT ib, ia FROM mpairs),
       |walk(id, lbl) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.id)
       |SELECT id, min(lbl) AS component FROM walk GROUP BY id ORDER BY id""".stripMargin

  /** q231 oracle: the q18 pair pipeline crossed with the q36 md5 split
    * law; counts and floor-ppm rates replayed verbatim. */
  private lazy val splitLeakageOracleSql: String =
    s"""WITH $minhashPipelineCte,
       |mpairs AS (
       |  SELECT DISTINCT a.id AS ia, b.id AS ib
       |  FROM sized a JOIN sized b ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
       |  WHERE a.bsz BETWEEN 2 AND 1000),
       |lab AS (
       |  SELECT ia, ib,
       |    ((${PortableHash.md5Hash60Sql("ia")} % 1000000) < 900000) AS ta,
       |    ((${PortableHash.md5Hash60Sql("ib")} % 1000000) < 900000) AS tb
       |  FROM mpairs),
       |ag AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |    CAST(COALESCE(SUM(CASE WHEN ta AND tb THEN 1 ELSE 0 END), 0)
       |      AS BIGINT) AS n_train_train,
       |    CAST(COALESCE(SUM(CASE WHEN NOT ta AND NOT tb THEN 1 ELSE 0 END), 0)
       |      AS BIGINT) AS n_held_held,
       |    CAST(COALESCE(SUM(CASE WHEN ta <> tb THEN 1 ELSE 0 END), 0)
       |      AS BIGINT) AS n_cross
       |  FROM lab),
       |lh AS (
       |  SELECT CAST(COUNT(DISTINCT CASE WHEN ta THEN ib ELSE ia END) AS BIGINT)
       |    AS n_held_docs_leaked
       |  FROM lab WHERE ta <> tb),
       |ht AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_held_docs FROM documents
       |  WHERE (${PortableHash.md5Hash60Sql("doc_id")} % 1000000) >= 900000)
       |SELECT n_pairs, n_train_train, n_held_held, n_cross,
       |  n_held_docs_leaked, n_held_docs,
       |  CASE WHEN n_pairs > 0
       |    THEN (n_cross * 1000000) // n_pairs ELSE 0 END AS leak_ppm,
       |  CASE WHEN n_held_docs > 0
       |    THEN (n_held_docs_leaked * 1000000) // n_held_docs ELSE 0 END
       |    AS exposure_ppm
       |FROM ag, lh, ht""".stripMargin

  /** q232 oracle: the q48 quantization replay, projected through the SAME
    * splitmix ±1 literals the Spark plan carries (both sides inline
    * [[graft.operators.Similarity.jlSigns]]'s output — that IS the replay
    * guarantee), full-dim and projected top-5 chains, overlap per probe. */
  private lazy val jlRecallOracleSql: String = {
    val dims = Seq(8, 16, 32)
    def projCte(d: Int): String = {
      val projList = Similarity.jlSigns(d, 64)
        .map(row => s"list_dot_product(v, [${row.map(x => s"$x.0").mkString(",")}])")
        .mkString(",\n      ")
      s"""p$d AS (
         |  SELECT vec_id, [
         |      $projList] AS v
         |  FROM q)""".stripMargin
    }
    def topkCte(src: String, out: String): String =
      s"""$out AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |        list_dot_product(a.v, b.v)
         |          / (sqrt(list_dot_product(a.v, a.v))
         |             * sqrt(list_dot_product(b.v, b.v))) DESC,
         |        b.vec_id) AS r
         |    FROM $src a JOIN $src b ON a.vec_id < 10 AND a.vec_id <> b.vec_id) z
         |  WHERE r <= 5)""".stripMargin
    val dimBlocks = dims.map { d =>
      s"""SELECT f.query_id, $d AS dim,
         |  CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_overlap,
         |  CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS DOUBLE) / 5 AS recall
         |FROM fullk f LEFT JOIN projk$d t
         |  ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
         |GROUP BY f.query_id""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |    list_max(list_transform(embedding, x -> abs(x))) AS ma
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id,
       |    CASE WHEN ma > 0 THEN list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
       |           AS DOUBLE))
       |    ELSE list_transform(embedding, x -> CAST(0.0 AS DOUBLE)) END AS v
       |  FROM e),
       |${dims.map(projCte).mkString(",\n")},
       |${topkCte("q", "fullk")},
       |${dims.map(d => topkCte(s"p$d", s"projk$d")).mkString(",\n")}
       |$dimBlocks
       |ORDER BY query_id, dim""".stripMargin
  }

  /** Shared CTE body replaying the IVF all-queries top-5 chain
    * (q171/q133/q139/q175): head centroids with nlist=⌈√n⌉, one
    * assignment CTE serving corpus bucketing (r=1) and probe lists
    * (r<=4), ends at `topk(qid, nid, rank)`. */
  private lazy val ivfTopkSqlCte: String =
    """cents AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id, embedding AS cent
      |  FROM embeddings ORDER BY vec_id
      |  LIMIT (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings)),
      |asg AS (
      |  SELECT e.vec_id AS id, e.embedding AS vec, c.cent_id,
      |         row_number() OVER (PARTITION BY e.vec_id
      |           ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC, c.cent_id) AS r
      |  FROM embeddings e, cents c),
      |bucketed AS (SELECT id AS nid, vec, cent_id AS bucket FROM asg WHERE r = 1),
      |probes AS (SELECT id AS qid, vec AS qv, cent_id AS bucket FROM asg WHERE r <= 4),
      |scored AS (
      |  SELECT p.qid, b.nid, list_cosine_similarity(p.qv, b.vec) AS cos
      |  FROM bucketed b JOIN probes p ON b.bucket = p.bucket AND p.qid <> b.nid),
      |topk AS (
      |  SELECT qid, nid, rank FROM (
      |    SELECT qid, nid, row_number() OVER (
      |      PARTITION BY qid ORDER BY cos DESC, nid) AS rank
      |    FROM scored) WHERE rank <= 5)""".stripMargin

  /** [[ivfTopkSqlCte]] extended to the reciprocal edge set
    * `mut(id_a, id_b, rank_ab, rank_ba)`, id_a < id_b. */
  private lazy val ivfMutualSqlCte: String =
    s"""$ivfTopkSqlCte,
       |mut AS (
       |  SELECT f.qid AS id_a, f.nid AS id_b, f.rank AS rank_ab, r.rank AS rank_ba
       |  FROM topk f JOIN topk r ON r.qid = f.nid AND r.nid = f.qid
       |  WHERE f.qid < f.nid)""".stripMargin

  /** Gonzalez k-center oracle CTE builder (q172/q184): the unrolled 4
    * selection rounds over `embeddings` rows passing `whereSql` (empty =
    * all), in the double-precision dot-product domain (bit-parity with the
    * native cosine; DuckDB's list_cosine_similarity is float32 and only
    * rank-safe). Ends at `e(vec_id, v, nrm)` (the filtered point set) and
    * `cents(rnk, cid, cv, cn)`. */
  private def kcenterSqlCte(whereSql: String): String =
    s"""emb2 AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings $whereSql),
       |e AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb2),
       |seed AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM e
       |         ORDER BY vec_id LIMIT 1),
       |d1 AS (
       |  SELECT p.vec_id, p.v, p.nrm,
       |         1.0 - list_dot_product(p.v, s.cv) / (p.nrm * s.cn) AS md
       |  FROM e p, seed s),
       |c2 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM d1
       |       ORDER BY md DESC, vec_id LIMIT 1),
       |d2 AS (SELECT d.vec_id, d.v, d.nrm,
       |         least(d.md,
       |           1.0 - list_dot_product(d.v, c.cv) / (d.nrm * c.cn)) AS md
       |       FROM d1 d, c2 c),
       |c3 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM d2
       |       ORDER BY md DESC, vec_id LIMIT 1),
       |d3 AS (SELECT d.vec_id, d.v, d.nrm,
       |         least(d.md,
       |           1.0 - list_dot_product(d.v, c.cv) / (d.nrm * c.cn)) AS md
       |       FROM d2 d, c3 c),
       |c4 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM d3
       |       ORDER BY md DESC, vec_id LIMIT 1),
       |cents AS (
       |  SELECT 0 AS rnk, cid, cv, cn FROM seed
       |  UNION ALL SELECT 1, cid, cv, cn FROM c2
       |  UNION ALL SELECT 2, cid, cv, cn FROM c3
       |  UNION ALL SELECT 3, cid, cv, cn FROM c4)""".stripMargin

  /** Shared CTE body recomputing the portable 60-bit simhash table in SQL
    * (token md5Hash60 -> per-bit +/-1 balances -> bit assembly). */
  /** Shared CTE replaying the CDC boundary/span pipeline (q78/q79): ends
    * at `chunks(doc_id, t, sp, ep)`. */
  private lazy val cdcChunksSqlCte: String = {
    val P = graft.functions.PortableHash.P31
    val B = graft.operators.Chunking.RollBase
    val tok = graft.functions.PortableHash.md5Hash60Sql("s")
    // Horner fold over the 4-token window ending at i (same mod-each-step
    // order as the Spark side's zip_with chain)
    val wh = (1 until 4).foldLeft("h[i - 3]") { (acc, k) =>
      s"((($acc) * $B + h[i - ${3 - k}]) % $P)"
    }
    s"""d AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, t, len(t) AS n,
       |    list_transform(t, s -> ($tok % $P)) AS h
       |  FROM d),
       |b AS (
       |  SELECT doc_id, t, n,
       |    CASE WHEN n >= 4 THEN
       |      list_filter(generate_series(4, n), i -> (($wh) % 64) = 0)
       |    ELSE [] END AS bpos
       |  FROM base),
       |s AS (
       |  SELECT doc_id, t, n,
       |    list_prepend(1, list_transform(bpos, x -> x + 1)) AS ss,
       |    list_append(bpos, n) AS es
       |  FROM b),
       |chunks AS (
       |  SELECT doc_id, t, ss[ci] AS sp, es[ci] AS ep
       |  FROM s, unnest(generate_series(1, len(ss))) AS u(ci)
       |  WHERE ss[ci] <= es[ci])""".stripMargin
  }

  private lazy val cdcChunkHashSql: String =
    graft.functions.PortableHash.md5Hash60Sql("array_to_string(t[sp:ep], ' ')")

  private lazy val simhashSqlCte: String = {
    val bits = 60
    val bals = (0 until bits)
      .map(i => s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(",\n    ")
    val assemble = (0 until bits)
      .map(i => s"CASE WHEN b$i > 0 THEN ${1L << i}::BIGINT ELSE 0::BIGINT END")
      .mkString("\n    + ")
    s"""toks AS (
       |  SELECT doc_id AS id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |  FROM documents),
       |h AS (SELECT id, ${PortableHash.md5Hash60Sql("tok")} AS h FROM toks),
       |bal AS (SELECT id, $bals FROM h GROUP BY id),
       |sim AS (SELECT id, $assemble AS simhash FROM bal)""".stripMargin
  }

  /** q33 oracle: replay the hyperplane band keys (same float-rounded plane
    * literals, sign of dot == sign of cosine), bucket-size gate, then exact
    * double cosine over candidate pairs. */
  private lazy val embNearDupOracleSql: String = {
    val dim = 64; val numBands = 4; val bandBits = 6
    def planeSql(p: Int): String =
      (0 until dim).map(i => Dedup.planeCoeff(p, i).toDouble.toString)
        .mkString("[", ", ", "]")
    def bandKeySql(b: Int): String =
      (0 until bandBits).map { bit =>
        s"CASE WHEN list_dot_product(v, ${planeSql(b * bandBits + bit)}) > 0 THEN ${1L << bit} ELSE 0 END"
      }.mkString("\n    + ")
    val bandSelects = (0 until numBands).map(b =>
      s"SELECT vec_id AS id, $b AS bno,\n    ${bandKeySql(b)} AS bk FROM e")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |banded AS (
       |  $bandSelects),
       |sized AS (SELECT *, COUNT(*) OVER (PARTITION BY bno, bk) AS bsz FROM banded),
       |pp AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM sized a JOIN sized b ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
       |  WHERE a.bsz BETWEEN 2 AND 1000),
       |scored AS (
       |  SELECT id_a, id_b,
       |    list_dot_product(ea.v, eb.v)
       |      / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS c
       |  FROM pp JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b)
       |SELECT id_a, id_b, CAST(c AS FLOAT) AS cos
       |FROM scored WHERE c >= CAST(0.3 AS DOUBLE)
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** One oracle, two engines-side algorithms (q85 md5-60 window screen,
    * q116 hash-free prefix doubling): the DuckDB brute-force duplicated
    * 8-token-window formulation both must match exactly. */
  private val dupSpanRangesOracle: String =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |win AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS sp, array_to_string(t[i:i+7], ' ') AS s
      |  FROM d, unnest(generate_series(1, len(t) - 7)) AS u(i)
      |  WHERE len(t) >= 8),
      |duph AS (
      |  SELECT s FROM (SELECT s, doc_id FROM win GROUP BY 1, 2)
      |  GROUP BY s HAVING COUNT(*) >= 2),
      |dup AS (SELECT doc_id, sp FROM win WHERE s IN (SELECT s FROM duph)),
      |isl AS (
      |  SELECT doc_id, sp,
      |    SUM(CASE WHEN psp IS NULL OR sp - psp > 8 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY sp) AS island
      |  FROM (SELECT doc_id, sp,
      |          LAG(sp) OVER (PARTITION BY doc_id ORDER BY sp) AS psp
      |        FROM dup))
      |SELECT doc_id, CAST(MIN(sp) AS BIGINT) AS span_start,
      |  CAST(MAX(sp) + 7 AS BIGINT) AS span_end,
      |  CAST(MAX(sp) + 7 - MIN(sp) + 1 AS BIGINT) AS span_tokens
      |FROM isl GROUP BY doc_id, island
      |ORDER BY doc_id, span_start""".stripMargin

  /** Shared q209/q210 oracle chain: q81's per-vector int8 quantization,
    * the FULL (i, j) Gram matrix in HUGEINT, and 8 unrolled rounds of the
    * integer-exact power recurrence (v fixed-point at 2^20; the division
    * only ever sees non-negative operands so DuckDB `//` replays the
    * BigInt quotient exactly — the q120 unrolled-fixed-point idiom). */
  private lazy val pcaChainSql: String = {
    // MATERIALIZED is load-bearing: v_k references u_k twice (matvec +
    // max), so default CTE inlining would double the expansion per
    // iteration (the q214 fd-exhaustion lesson)
    val steps = (1 to 8).map { k =>
      s"""u$k AS MATERIALIZED (SELECT g.i AS dim, SUM(g.g * p.val) AS u
         |  FROM g JOIN v${k - 1} p ON p.dim = g.j GROUP BY 1),
         |m$k AS (SELECT GREATEST(MAX(ABS(u)), 1) AS ma FROM u$k),
         |v$k AS MATERIALIZED (SELECT dim,
         |    CASE WHEN u >= 0 THEN (u * 1048576) // ma
         |         ELSE -(((-u) * 1048576) // ma) END AS val
         |  FROM u$k, m$k)""".stripMargin
    }.mkString(",\n")
    s"""e AS (
       |  SELECT vec_id, embedding,
       |    list_max(list_transform(embedding, x -> abs(x))) AS ma
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id,
       |    CASE WHEN ma > 0 THEN list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
       |           AS BIGINT))
       |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS v
       |  FROM e),
       |g AS MATERIALIZED (
       |  SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
       |    CAST(SUM(v[i + 1] * v[j + 1]) AS HUGEINT) AS g
       |  FROM q, range(64) r1(i), range(64) r2(j)
       |  GROUP BY 1, 2),
       |v0 AS MATERIALIZED (
       |  SELECT CAST(i AS INTEGER) AS dim, CAST(1048576 AS HUGEINT) AS val
       |  FROM range(64) r(i)),
       |$steps""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q209_pca_power" ->
      s"""WITH $pcaChainSql
         |SELECT CAST(v8.dim AS INTEGER) AS dim, CAST(v8.val AS BIGINT) AS loading,
         |  (SELECT CAST(ma // 1048576 AS BIGINT) FROM m8) AS lambda_fp
         |FROM v8 ORDER BY dim""".stripMargin,
    "q210_pca_scores" ->
      s"""WITH $pcaChainSql,
         |sc AS (SELECT q.vec_id,
         |    CAST(SUM(q.v[v8.dim + 1] * v8.val) AS HUGEINT) AS score
         |  FROM q, v8 GROUP BY 1)
         |SELECT CAST(((score + 1099511627776) // 67108864) - 16384 AS BIGINT)
         |    AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(MIN(score) AS BIGINT) AS min_score,
         |  CAST(MAX(score) AS BIGINT) AS max_score
         |FROM sc GROUP BY 1 ORDER BY bucket""".stripMargin,
    // the same base hash, affine permutations, thresholds, and
    // exact-integer weighted sums; the band replays through quantile_cont
    // (the q207 kernel-parity contract)
    "q211_bootstrap_ci" -> {
      val h0 = graft.functions.PortableHash.md5Hash60Sql("CAST(event_id AS VARCHAR)")
      val w = graft.operators.Bootstrap.poissonWeightSql("v")
      val coef = graft.operators.Bootstrap.affineCoeffValuesSql(32)
      s"""WITH ev AS (
         |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         |    $h0 AS h0
         |  FROM events),
         |co(b, ca, cb) AS (VALUES $coef),
         |vx AS (
         |  SELECT event_type, cents, b,
         |    ((ca * (h0 & 2147483647) + cb) % 2147483647) AS v
         |  FROM ev, co),
         |wx AS (SELECT event_type, cents, b, $w AS w FROM vx),
         |reps AS (
         |  SELECT event_type, b,
         |    CAST(SUM(CAST(cents AS HUGEINT) * w) AS DOUBLE)
         |      / CAST(SUM(w) AS DOUBLE) AS mean
         |  FROM wx GROUP BY 1, 2),
         |ci AS (
         |  SELECT event_type, quantile_cont(mean, 0.025) AS lo_cents,
         |    quantile_cont(mean, 0.975) AS hi_cents
         |  FROM reps GROUP BY 1),
         |f AS (
         |  SELECT event_type,
         |    CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE)
         |      / CAST(COUNT(*) AS DOUBLE) AS mean_cents
         |  FROM ev GROUP BY 1)
         |SELECT f.event_type, mean_cents, lo_cents, hi_cents
         |FROM f JOIN ci USING (event_type)
         |ORDER BY event_type""".stripMargin
    },
    // strict-dominance NOT EXISTS at the aggregated customer grain — the
    // quadratic formulation is fine at oracle scale; the Spark side never
    // builds it
    "q212_skyline" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(round(o_totalprice * 100) AS HUGEINT)) AS BIGINT)
        |      AS total_cents,
        |    CAST(MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT)
        |      AS last_day,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT o_custkey, total_cents, last_day, n_orders
        |FROM cust c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM cust d
        |  WHERE d.total_cents >= c.total_cents AND d.last_day >= c.last_day
        |    AND d.n_orders >= c.n_orders
        |    AND (d.total_cents > c.total_cents OR d.last_day > c.last_day
        |         OR d.n_orders > c.n_orders))
        |ORDER BY o_custkey""".stripMargin,
    // 2x2 presence counts as exact integers; phi with the identical
    // double association and one IEEE sqrt
    "q213_token_phi" ->
      """WITH d AS (
        |  SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |pres AS (SELECT DISTINCT doc_id, u.token
        |         FROM d, unnest(w) AS u(token)),
        |tt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM pres
        |       GROUP BY 1 ORDER BY df DESC, token LIMIT 20),
        |lc AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl FROM documents GROUP BY 1),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        |aa AS (
        |  SELECT p.token, dd.lang, CAST(COUNT(*) AS BIGINT) AS a
        |  FROM pres p
        |  JOIN documents dd USING (doc_id)
        |  JOIN tt ON tt.token = p.token
        |  GROUP BY 1, 2),
        |cells AS (
        |  SELECT tt.token, lc.lang,
        |    COALESCE(aa.a, 0) AS n_both,
        |    tt.df - COALESCE(aa.a, 0) AS n_token_only,
        |    lc.nl - COALESCE(aa.a, 0) AS n_lang_only,
        |    nn.n - tt.df - lc.nl + COALESCE(aa.a, 0) AS n_neither
        |  FROM tt CROSS JOIN lc CROSS JOIN nn
        |  LEFT JOIN aa ON aa.token = tt.token AND aa.lang = lc.lang)
        |SELECT token, lang, n_both, n_token_only, n_lang_only, n_neither,
        |  CASE WHEN (CAST(n_both + n_token_only AS DOUBLE)
        |               * CAST(n_lang_only + n_neither AS DOUBLE))
        |            * (CAST(n_both + n_lang_only AS DOUBLE)
        |               * CAST(n_token_only + n_neither AS DOUBLE)) > 0
        |    THEN (CAST(n_both AS DOUBLE) * CAST(n_neither AS DOUBLE)
        |          - CAST(n_token_only AS DOUBLE) * CAST(n_lang_only AS DOUBLE))
        |         / sqrt((CAST(n_both + n_token_only AS DOUBLE)
        |                  * CAST(n_lang_only + n_neither AS DOUBLE))
        |                * (CAST(n_both + n_lang_only AS DOUBLE)
        |                   * CAST(n_token_only + n_neither AS DOUBLE)))
        |  END AS phi
        |FROM cells ORDER BY token, lang""".stripMargin,
    // q120's unrolled-fixed-point posture for the HITS recurrence: all
    // operands non-negative, HUGEINT sums, `//` == div
    "q214_hits" -> {
      // MATERIALIZED is load-bearing: each level references its
      // predecessor twice (raw + max), so DuckDB's default CTE inlining
      // doubles the expansion per iteration — 2^8 scans of lineitem
      // exhausts the fd limit before it exhausts patience
      val iters = (1 to 8).map { k =>
        s"""hr$k AS MATERIALIZED (SELECT e.h, SUM(p.s) AS raw FROM ed e
           |  JOIN a${k - 1} p ON p.node = e.a GROUP BY 1),
           |hm$k AS (SELECT GREATEST(MAX(raw), 1) AS m FROM hr$k),
           |h$k AS MATERIALIZED (SELECT h AS node, (raw * 1048576) // m AS s
           |  FROM hr$k, hm$k),
           |ar$k AS MATERIALIZED (SELECT e.a, SUM(p.s) AS raw FROM ed e
           |  JOIN h$k p ON p.node = e.h GROUP BY 1),
           |am$k AS (SELECT GREATEST(MAX(raw), 1) AS m FROM ar$k),
           |a$k AS MATERIALIZED (SELECT a AS node, (raw * 1048576) // m AS s
           |  FROM ar$k, am$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH ed AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS h, l_partkey AS a FROM lineitem),
         |a0 AS MATERIALIZED (
         |  SELECT DISTINCT a AS node, CAST(1048576 AS HUGEINT) AS s FROM ed),
         |$iters
         |SELECT node AS part, CAST(s AS BIGINT) AS authority_fp
         |FROM a8 ORDER BY authority_fp DESC, part LIMIT 100""".stripMargin
    },
    // q209's quantization + exact integer dots; the greedy unrolls with
    // MATERIALIZED sel sets (each round references the previous twice)
    "q215_mmr_select" -> {
      val rounds = (2 to 10).map { k =>
        s"""m$k AS MATERIALIZED (
           |  SELECT p.id, p.rel, MAX(ps.sim) AS ms
           |  FROM pool p JOIN ps ON ps.ia = p.id
           |    AND ps.ib IN (SELECT id FROM sel${k - 1})
           |  WHERE p.id NOT IN (SELECT id FROM sel${k - 1})
           |  GROUP BY 1, 2),
           |pick$k AS MATERIALIZED (
           |  SELECT $k AS round, id, rel, ms AS max_sim,
           |    7 * rel - 3 * ms AS mmr_fp
           |  FROM m$k ORDER BY mmr_fp DESC, id LIMIT 1),
           |sel$k AS MATERIALIZED (
           |  SELECT * FROM sel${k - 1} UNION ALL SELECT * FROM pick$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(x))) AS ma
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id,
         |    CASE WHEN ma > 0 THEN list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
         |           AS BIGINT))
         |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS v
         |  FROM e),
         |qq AS (SELECT v FROM q WHERE vec_id = 0),
         |relx AS MATERIALIZED (
         |  SELECT q.vec_id AS id, CAST(SUM(q.v[i + 1] * qq.v[i + 1]) AS BIGINT) AS rel
         |  FROM q, qq, range(64) r(i)
         |  WHERE q.vec_id <> 0 GROUP BY 1),
         |pool AS MATERIALIZED (
         |  SELECT id, rel FROM relx ORDER BY rel DESC, id LIMIT 50),
         |ps AS MATERIALIZED (
         |  SELECT a.vec_id AS ia, b.vec_id AS ib,
         |    CAST(SUM(a.v[i + 1] * b.v[i + 1]) AS BIGINT) AS sim
         |  FROM q a JOIN pool pa ON pa.id = a.vec_id
         |  JOIN q b ON a.vec_id <> b.vec_id
         |  JOIN pool pb ON pb.id = b.vec_id, range(64) r(i)
         |  GROUP BY 1, 2),
         |sel1 AS MATERIALIZED (
         |  SELECT 1 AS round, id, rel, CAST(0 AS BIGINT) AS max_sim,
         |    7 * rel AS mmr_fp
         |  FROM pool ORDER BY mmr_fp DESC, id LIMIT 1),
         |$rounds
         |SELECT CAST(round AS INTEGER) AS round, id AS vec_id, rel, max_sim,
         |  mmr_fp
         |FROM sel10 ORDER BY round""".stripMargin
    },
    // q120's unrolled recurrence with seed-gated teleport mass
    "q216_ppr" -> {
      val iters = (1 to 10).map { k =>
        val prev = if (k == 1) "s0" else s"s${k - 1}"
        s"""s$k AS (SELECT d.node, d.outdeg, d.is_seed,
           |  (CASE WHEN d.is_seed THEN 15000000000000 // (100 * nn.ns)
           |        ELSE 0 END)
           |    + (85 * COALESCE(c.s, 0)) // 100 AS score
           |  FROM deg2 d CROSS JOIN nn
           |  LEFT JOIN (SELECT e.dst, CAST(SUM(s.score // s.outdeg) AS BIGINT) AS s
           |             FROM ed e JOIN $prev s ON s.node = e.src GROUP BY e.dst) c
           |  ON c.dst = d.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |pairs AS (
         |  SELECT a.p AS pa, b.p AS pb FROM op a JOIN op b
         |  ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING count(*) >= 2),
         |ed AS (SELECT pa AS src, pb AS dst FROM pairs
         |       UNION ALL SELECT pb, pa FROM pairs),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
         |        FROM ed GROUP BY 1),
         |seeds AS (SELECT node FROM deg ORDER BY node LIMIT 5),
         |nn AS (SELECT count(*) AS ns FROM seeds),
         |deg2 AS (SELECT d.node, d.outdeg, (s.node IS NOT NULL) AS is_seed
         |         FROM deg d LEFT JOIN seeds s ON s.node = d.node),
         |s0 AS (SELECT node, outdeg, is_seed,
         |         CASE WHEN is_seed THEN 1000000000000 // nn.ns ELSE 0 END AS score
         |       FROM deg2 CROSS JOIN nn),
         |$iters
         |SELECT node AS part, score FROM s10
         |ORDER BY score DESC, part LIMIT 100""".stripMargin
    },
    // exact HUGEINT degree moments off one edge pass; Newman's r with the
    // identical double association and two IEEE sqrts
    "q217_assortativity" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |pairs AS (
        |  SELECT a.p AS pa, b.p AS pb FROM op a JOIN op b
        |  ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING count(*) >= 2),
        |ed AS (SELECT pa AS src, pb AS dst FROM pairs
        |       UNION ALL SELECT pb, pa FROM pairs),
        |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        |        FROM ed GROUP BY 1),
        |ex AS (SELECT dx.deg AS dx, dy.deg AS dy
        |       FROM ed e JOIN deg dx ON dx.node = e.src
        |       JOIN deg dy ON dy.node = e.dst),
        |m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m,
        |        CAST(SUM(dx) AS HUGEINT) AS sx, CAST(SUM(dy) AS HUGEINT) AS sy,
        |        CAST(SUM(dx * dy) AS HUGEINT) AS sxy,
        |        CAST(SUM(dx * dx) AS HUGEINT) AS sxx,
        |        CAST(SUM(dy * dy) AS HUGEINT) AS syy
        |      FROM ex),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |         CAST(MAX(deg) AS BIGINT) AS max_deg FROM deg)
        |SELECT n_nodes, CAST(m AS BIGINT) AS m_edges, max_deg,
        |  CAST(m * sxy - sx * sy AS DOUBLE)
        |    / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
        |       * sqrt(CAST(m * syy - sy * sy AS DOUBLE))) AS assortativity
        |FROM m, nd""".stripMargin,
    // q209's quantization; 3 unrolled Lloyd rounds — centroids as
    // (cid, dim, val) rows, assignment via (d, cid) row_number, update
    // via sign-split truncating division; MATERIALIZED throughout (each
    // round references its predecessor several times)
    "q218_kmeans_lloyd" -> {
      val rounds = (1 to 3).map { t =>
        s"""ad$t AS MATERIALIZED (
           |  SELECT q.vec_id, c.cid,
           |    SUM((q.v[c.dim + 1] * 1024 - c.val)
           |        * (q.v[c.dim + 1] * 1024 - c.val)) AS d
           |  FROM q CROSS JOIN c${t - 1} c GROUP BY 1, 2),
           |as$t AS MATERIALIZED (
           |  SELECT vec_id, cid, d FROM (
           |    SELECT vec_id, cid, d,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
           |    FROM ad$t) z$t WHERE rn = 1),
           |up$t AS MATERIALIZED (
           |  SELECT a.cid, CAST(r.i AS INTEGER) AS dim, SUM(q.v[r.i + 1]) AS sx,
           |    COUNT(*) AS n
           |  FROM as$t a JOIN q ON q.vec_id = a.vec_id, range(64) r(i)
           |  GROUP BY 1, 2),
           |c$t AS MATERIALIZED (
           |  SELECT c.cid, c.dim,
           |    COALESCE(CASE WHEN u.sx >= 0 THEN (u.sx * 1024) // u.n
           |                  ELSE -(((-u.sx) * 1024) // u.n) END, c.val) AS val
           |  FROM c${t - 1} c LEFT JOIN up$t u
           |  ON u.cid = c.cid AND u.dim = c.dim)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(x))) AS ma
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id,
         |    CASE WHEN ma > 0 THEN list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
         |           AS BIGINT))
         |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS v
         |  FROM e),
         |c0 AS MATERIALIZED (
         |  SELECT s.vec_id AS cid, CAST(r.i AS INTEGER) AS dim,
         |    q.v[r.i + 1] * 1024 AS val
         |  FROM (SELECT vec_id FROM q ORDER BY vec_id LIMIT 8) s
         |  JOIN q ON q.vec_id = s.vec_id, range(64) r(i)),
         |$rounds,
         |ad4 AS MATERIALIZED (
         |  SELECT q.vec_id, c.cid,
         |    SUM((q.v[c.dim + 1] * 1024 - c.val)
         |        * (q.v[c.dim + 1] * 1024 - c.val)) AS d
         |  FROM q CROSS JOIN c3 c GROUP BY 1, 2),
         |as4 AS MATERIALIZED (
         |  SELECT vec_id, cid, d FROM (
         |    SELECT vec_id, cid, d,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
         |    FROM ad4) z4 WHERE rn = 1)
         |SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members,
         |  CAST(SUM(CAST(d AS HUGEINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS avg_dist2
         |FROM as4 GROUP BY 1 ORDER BY cid""".stripMargin
    },
    // disjoint-algorithm differential: the Spark side thresholds ONE
    // Borůvka forest; the oracle re-derives every threshold's components
    // by recursive reachability on the base graph — agreement is the
    // single-linkage property itself
    "q219_single_linkage" -> {
      val blocks = Seq(2, 3, 5, 8).map { m =>
        s"""ed$m AS (SELECT pa, pb FROM pairs WHERE c >= $m),
           |eb$m AS (SELECT pa AS a, pb AS b FROM ed$m
           |         UNION SELECT pb, pa FROM ed$m),
           |walk$m(id, lbl) AS (
           |  SELECT a, a FROM eb$m
           |  UNION
           |  SELECT e.b, w.lbl FROM walk$m w JOIN eb$m e ON e.a = w.id),
           |cp$m AS (SELECT id, MIN(lbl) AS comp FROM walk$m GROUP BY 1),
           |cs$m AS (SELECT comp, COUNT(*) AS sz FROM cp$m GROUP BY 1),
           |st$m AS (SELECT CAST($m AS BIGINT) AS min_count,
           |  CAST((SELECT n FROM nn)
           |    - (COALESCE((SELECT SUM(sz) FROM cs$m), 0)
           |       - COALESCE((SELECT COUNT(*) FROM cs$m), 0)) AS BIGINT)
           |    AS n_clusters,
           |  CAST(COALESCE((SELECT SUM(sz) FROM cs$m), 0) AS BIGINT)
           |    AS clustered_nodes,
           |  CAST(COALESCE((SELECT MAX(sz) FROM cs$m), 1) AS BIGINT)
           |    AS largest_cluster)""".stripMargin
      }.mkString(",\n")
      s"""WITH RECURSIVE
         |op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |pairs AS MATERIALIZED (
         |  SELECT a.p AS pa, b.p AS pb, count(*) AS c FROM op a JOIN op b
         |  ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING count(*) >= 2),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM
         |  (SELECT pa AS x FROM pairs UNION SELECT pb FROM pairs)),
         |$blocks
         |SELECT * FROM st2 UNION ALL SELECT * FROM st3
         |UNION ALL SELECT * FROM st5 UNION ALL SELECT * FROM st8
         |ORDER BY min_count""".stripMargin
    },
    // 6 unrolled min-relaxation rounds; MATERIALIZED because each round
    // references its predecessor twice (carry + relax)
    "q220_bfs_layers" -> {
      val rounds = (1 to 6).map { k =>
        s"""d$k AS MATERIALIZED (
           |  SELECT n.node, LEAST(n.d, COALESCE(r.nd, 999999)) AS d
           |  FROM d${k - 1} n LEFT JOIN
           |    (SELECT e.dst AS node, MIN(p.d + 1) AS nd
           |     FROM ed e JOIN d${k - 1} p ON p.node = e.src GROUP BY 1) r
           |  ON r.node = n.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |pairs AS MATERIALIZED (
         |  SELECT a.p AS pa, b.p AS pb FROM op a JOIN op b
         |  ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING count(*) >= 2),
         |ed AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM pairs
         |      UNION ALL SELECT pb, pa FROM pairs),
         |nodes AS (SELECT DISTINCT src AS node FROM ed),
         |seeds AS (SELECT node FROM nodes ORDER BY node LIMIT 5),
         |d0 AS MATERIALIZED (
         |  SELECT n.node, CASE WHEN s.node IS NOT NULL THEN 0 ELSE 999999 END AS d
         |  FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
         |$rounds
         |SELECT CAST(d AS BIGINT) AS hops, CAST(COUNT(*) AS BIGINT) AS n_nodes
         |FROM d6 GROUP BY 1 ORDER BY hops""".stripMargin
    },
    // one first-appearance table, every curve point a count over it;
    // thresholds replay through quantile_cont (the q207 parity contract)
    "q223_heaps_curve" -> {
      val blocks = Seq(("125", "0.125"), ("25", "0.25"), ("5", "0.5"),
        ("100", "1.0")).map { case (t, p) =>
        s"""c$t AS (SELECT CAST($p AS DOUBLE) AS prob,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents, tq
           |   WHERE CAST(doc_id AS DOUBLE) <= t$t) AS n_docs,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM fd, tq
           |   WHERE CAST(first_doc AS DOUBLE) <= t$t) AS vocab,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM tok, tq
           |   WHERE CAST(doc_id AS DOUBLE) <= t$t) AS occurrences)""".stripMargin
      }.mkString(",\n")
      s"""WITH tok AS MATERIALIZED (
         |  SELECT doc_id, u.token
         |  FROM (SELECT doc_id,
         |          string_split_regex(trim(lower(text)), '\\s+') AS w
         |        FROM documents) d, unnest(w) AS u(token)),
         |fd AS MATERIALIZED (
         |  SELECT token, MIN(doc_id) AS first_doc FROM tok GROUP BY 1),
         |tq AS (SELECT
         |    quantile_cont(CAST(doc_id AS DOUBLE), 0.125) AS t125,
         |    quantile_cont(CAST(doc_id AS DOUBLE), 0.25) AS t25,
         |    quantile_cont(CAST(doc_id AS DOUBLE), 0.5) AS t5,
         |    quantile_cont(CAST(doc_id AS DOUBLE), 1.0) AS t100
         |  FROM documents),
         |$blocks
         |SELECT prob, n_docs, vocab, occurrences,
         |  CAST(vocab AS DOUBLE) / CAST(occurrences AS DOUBLE)
         |    AS type_token_ratio
         |FROM (SELECT * FROM c125 UNION ALL SELECT * FROM c25
         |      UNION ALL SELECT * FROM c5 UNION ALL SELECT * FROM c100)
         |ORDER BY prob""".stripMargin
    },
    // a<b<c triangle enumeration on the canonical edge set; the bucket is
    // integer arithmetic end-to-end so no float boundary can flip it
    "q224_clustering_coeff" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |pairs AS (
        |  SELECT a.p AS pa, b.p AS pb FROM op a JOIN op b
        |  ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING count(*) >= 2),
        |ed AS MATERIALIZED (SELECT pa AS u, pb AS v FROM pairs),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM
        |  (SELECT u AS node FROM ed UNION ALL SELECT v FROM ed) GROUP BY 1),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM ed e1 JOIN ed e2 ON e2.u = e1.v
        |  JOIN ed e3 ON e3.u = e1.u AND e3.v = e2.v),
        |pn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS t FROM
        |  (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |   UNION ALL SELECT c FROM tri) GROUP BY 1),
        |nt AS (
        |  SELECT d.node, d.degree, COALESCE(pn.t, 0) AS t
        |  FROM deg d LEFT JOIN pn ON pn.node = d.node
        |  WHERE d.degree >= 2)
        |SELECT LEAST((20 * t) // (degree * (degree - 1)), 9) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |  CAST(SUM(t) AS BIGINT) AS sum_triangles
        |FROM nt GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q225_stratified_ate" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |p AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS pivot FROM ev),
        |pu AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN day < p.pivot THEN cents ELSE 0 END) AS pre,
        |    SUM(CASE WHEN day >= p.pivot THEN cents ELSE 0 END) AS post
        |  FROM ev, p GROUP BY 1),
        |g AS (
        |  SELECT CAST(pre // 16384 AS BIGINT) AS band,
        |    SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n_treated,
        |    SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_control,
        |    SUM(CASE WHEN user_id % 2 = 1 THEN post ELSE 0 END) AS sum_treated,
        |    SUM(CASE WHEN user_id % 2 = 0 THEN post ELSE 0 END) AS sum_control
        |  FROM pu GROUP BY 1)
        |SELECT band, CAST(n_treated AS BIGINT) AS n_treated,
        |  CAST(n_control AS BIGINT) AS n_control,
        |  CAST(sum_treated AS BIGINT) AS sum_treated,
        |  CAST(sum_control AS BIGINT) AS sum_control,
        |  CAST(sum_treated AS DOUBLE) / CAST(n_treated AS DOUBLE)
        |    - CAST(sum_control AS DOUBLE) / CAST(n_control AS DOUBLE)
        |    AS att_cents
        |FROM g WHERE n_treated > 0 AND n_control > 0
        |ORDER BY band""".stripMargin,
    "q226_km_risk_table" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day, event_type
        |  FROM events),
        |m AS (SELECT MAX(day) AS maxday FROM ev),
        |pu AS (
        |  SELECT user_id, MIN(day) AS t0,
        |    MIN(CASE WHEN event_type = 'purchase' THEN day END) AS cv
        |  FROM ev GROUP BY 1),
        |du AS (
        |  SELECT CASE WHEN cv IS NOT NULL THEN cv - t0
        |              ELSE (SELECT maxday FROM m) - t0 END AS d,
        |    CASE WHEN cv IS NOT NULL THEN 1 ELSE 0 END AS e
        |  FROM pu),
        |g AS (SELECT d, SUM(e) AS n_event, SUM(1 - e) AS n_censor
        |      FROM du GROUP BY 1),
        |r AS (
        |  SELECT d, n_event, n_censor,
        |    SUM(n_event + n_censor) OVER (
        |      ORDER BY d DESC ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS n_risk
        |  FROM g)
        |SELECT CAST(d AS BIGINT) AS duration_days,
        |  CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(n_event AS BIGINT) AS n_event,
        |  CAST(n_censor AS BIGINT) AS n_censor,
        |  CAST((n_event * 1000000) // n_risk AS BIGINT) AS hazard_ppm
        |FROM r ORDER BY duration_days""".stripMargin,
    "q227_conformal_coverage" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS x,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS y
        |  FROM documents),
        |m AS (
        |  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        |  FROM d WHERE doc_id % 4 < 2),
        |fit AS (SELECT
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
        |    sy, sx, n FROM m),
        |fit2 AS (SELECT slope,
        |    (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS intercept,
        |    CAST(n AS BIGINT) AS n_train FROM fit),
        |cal AS (
        |  SELECT ABS(CAST(y AS DOUBLE)
        |    - (intercept + slope * CAST(x AS DOUBLE))) AS r
        |  FROM d, fit2 WHERE doc_id % 4 = 2),
        |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
        |         CAST((9 * (COUNT(*) + 1) + 9) // 10 AS BIGINT) AS k
        |       FROM cal),
        |q AS (SELECT r AS qhat FROM cal ORDER BY r
        |      LIMIT 1 OFFSET (SELECT k - 1 FROM kk)),
        |te AS (
        |  SELECT ABS(CAST(y AS DOUBLE)
        |    - (intercept + slope * CAST(x AS DOUBLE))) AS r
        |  FROM d, fit2 WHERE doc_id % 4 = 3)
        |SELECT f.n_train, kk.n_cal, kk.k, q.qhat,
        |  CAST(COUNT(*) AS BIGINT) AS n_test,
        |  CAST(SUM(CASE WHEN te.r <= q.qhat THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_covered,
        |  CAST((SUM(CASE WHEN te.r <= q.qhat THEN 1 ELSE 0 END) * 1000000)
        |    // COUNT(*) AS BIGINT) AS coverage_ppm,
        |  f.slope, f.intercept
        |FROM te, fit2 f, kk, q
        |GROUP BY f.n_train, kk.n_cal, kk.k, q.qhat, f.slope, f.intercept"""
        .stripMargin,
    "q228_cusum_change" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day
        |  FROM events),
        |p AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS pivot FROM ev),
        |daily AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
        |          FROM ev GROUP BY 1, 2),
        |base AS (
        |  SELECT event_type,
        |    CAST(SUM(x) // COUNT(*) AS BIGINT) AS b,
        |    CAST(GREATEST(1, (SUM(x) // COUNT(*)) // 20) AS BIGINT) AS a,
        |    CAST(GREATEST(1, SUM(x) // COUNT(*)) AS BIGINT) AS h
        |  FROM daily, p WHERE day < p.pivot GROUP BY 1),
        |post AS (
        |  SELECT d.event_type, d.day, b.b, b.a, b.h,
        |    SUM(d.x - b.b - b.a) OVER (
        |      PARTITION BY d.event_type ORDER BY d.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
        |  FROM daily d JOIN base b USING (event_type), p
        |  WHERE d.day >= p.pivot),
        |cs AS (
        |  SELECT event_type, day, b, a, h,
        |    pp - LEAST(MIN(pp) OVER (
        |      PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS s
        |  FROM post)
        |SELECT event_type, b, a, h,
        |  CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(MAX(s) AS BIGINT) AS max_cusum,
        |  MIN(CASE WHEN s > h THEN day END) AS alarm_day,
        |  CAST(SUM(CASE WHEN s > h THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_alarm_days
        |FROM cs GROUP BY 1, 2, 3, 4 ORDER BY event_type""".stripMargin,
    // Replays the aHash from the closed-form pixel law gray = (id*31 +
    // x*7 + y*13) % 256 (PNG is lossless, so the Spark side's real
    // ImageIO decode sees exactly these values): 8x8 nearest-neighbor
    // lattice -> floor-mean threshold -> 4x16-bit bands -> band-bucket
    // candidates at the distinct-fingerprint grain -> bit_count(xor)
    // Hamming verify -> group re-expansion. Same algebra as the Spark
    // plan, codec-free.
    "q229_phash_neardup" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id,
        |    CAST(doc_id % 32 + 1 AS INTEGER) AS w,
        |    CAST(doc_id % 24 + 1 AS INTEGER) AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |px AS (
        |  SELECT media_id, (js.j * 8 + ii.i) AS p,
        |    (media_id * 31 + ((ii.i * w) // 8) * 7
        |      + ((js.j * h) // 8) * 13) % 256 AS g
        |  FROM img,
        |    unnest(generate_series(0, 7)) AS ii(i),
        |    unnest(generate_series(0, 7)) AS js(j)),
        |m AS (SELECT media_id, SUM(g) // 64 AS mean FROM px GROUP BY 1),
        |b AS (
        |  SELECT px.media_id, p // 16 AS band,
        |    CAST(SUM(CASE WHEN g >= mean THEN (1 << (p % 16)) ELSE 0 END)
        |      AS INTEGER) AS bk
        |  FROM px JOIN m USING (media_id) GROUP BY 1, 2),
        |hs AS (
        |  SELECT media_id,
        |    MAX(CASE WHEN band = 0 THEN bk END) AS b0,
        |    MAX(CASE WHEN band = 1 THEN bk END) AS b1,
        |    MAX(CASE WHEN band = 2 THEN bk END) AS b2,
        |    MAX(CASE WHEN band = 3 THEN bk END) AS b3
        |  FROM b GROUP BY 1),
        |grp AS (
        |  SELECT b0, b1, b2, b3, list_sort(list(media_id)) AS ids,
        |    MIN(media_id) AS rep
        |  FROM hs GROUP BY 1, 2, 3, 4),
        |banded AS (
        |  SELECT rep, 0 AS band, b0 AS bk FROM grp
        |  UNION ALL SELECT rep, 1, b1 FROM grp
        |  UNION ALL SELECT rep, 2, b2 FROM grp
        |  UNION ALL SELECT rep, 3, b3 FROM grp),
        |rp AS (
        |  SELECT DISTINCT x.rep AS ra, y.rep AS rb
        |  FROM banded x JOIN banded y
        |    ON x.band = y.band AND x.bk = y.bk AND x.rep < y.rep),
        |ham AS (
        |  SELECT ra, rb,
        |    CAST(bit_count(xor(ga.b0, gb.b0)) + bit_count(xor(ga.b1, gb.b1))
        |      + bit_count(xor(ga.b2, gb.b2)) + bit_count(xor(ga.b3, gb.b3))
        |      AS BIGINT) AS hamming,
        |    ga.ids AS ia, gb.ids AS ib
        |  FROM rp
        |  JOIN grp ga ON ga.rep = ra
        |  JOIN grp gb ON gb.rep = rb),
        |cross_pairs AS (
        |  SELECT LEAST(xa.a, yb.b) AS id_a, GREATEST(xa.a, yb.b) AS id_b,
        |    hamming
        |  FROM ham, unnest(ia) AS xa(a), unnest(ib) AS yb(b)
        |  WHERE hamming <= 3),
        |within AS (
        |  SELECT xa.a AS id_a, yb.b AS id_b, CAST(0 AS BIGINT) AS hamming
        |  FROM grp, unnest(ids) AS xa(a), unnest(ids) AS yb(b)
        |  WHERE xa.a < yb.b)
        |SELECT id_a, id_b, hamming FROM cross_pairs
        |UNION ALL SELECT id_a, id_b, hamming FROM within
        |ORDER BY id_a, id_b""".stripMargin,
    // the q115/q217 co-purchase edge harvest + brand dim joins; the
    // squared degree-mass ppm term runs in HUGEINT (it overflows BIGINT
    // at ~100x), the doubles are single IEEE ops over exact counts
    "q230_modularity" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        |  SELECT a.p AS pa, b.p AS pb
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |eb AS (
        |  SELECT e.pa, e.pb, x.p_brand AS ba, y.p_brand AS bb
        |  FROM edges e JOIN part x ON x.p_partkey = e.pa
        |               JOIN part y ON y.p_partkey = e.pb),
        |deg AS (
        |  SELECT node, brand, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |    SELECT pa AS node, ba AS brand FROM eb
        |    UNION ALL SELECT pb, bb FROM eb) z GROUP BY node, brand),
        |bb AS (
        |  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |    CAST(SUM(deg) AS BIGINT) AS degree_sum
        |  FROM deg GROUP BY brand),
        |wi AS (
        |  SELECT ba AS brand, CAST(COUNT(*) AS BIGINT) AS within_edges
        |  FROM eb WHERE ba = bb GROUP BY ba),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_edges FROM eb)
        |SELECT b.brand, b.n_nodes, b.degree_sum,
        |  CAST(COALESCE(w.within_edges, 0) AS BIGINT) AS within_edges,
        |  m.m_edges,
        |  CAST((COALESCE(w.within_edges, 0) * 1000000) // m.m_edges
        |    - (CAST(b.degree_sum AS HUGEINT) * b.degree_sum * 1000000)
        |      // (CAST(m.m_edges AS HUGEINT) * m.m_edges * 4)
        |    AS BIGINT) AS contrib_ppm,
        |  CAST(COALESCE(w.within_edges, 0) AS DOUBLE) / CAST(m.m_edges AS DOUBLE)
        |    - (CAST(b.degree_sum AS DOUBLE) / (CAST(m.m_edges AS DOUBLE) * 2.0))
        |      * (CAST(b.degree_sum AS DOUBLE) / (CAST(m.m_edges AS DOUBLE) * 2.0))
        |    AS contrib
        |FROM bb b LEFT JOIN wi w USING (brand), m
        |ORDER BY brand""".stripMargin,
    "q231_split_leakage" -> splitLeakageOracleSql,
    "q232_jl_recall" -> jlRecallOracleSql,
    // q67's bucket-assignment replay + integer distances + core-4 +
    // mutual-reachability weights, then per-threshold components by
    // recursive reachability (the q219 no-forest differential)
    "q222_hdbscan_profile" -> {
      val blocks = Seq(("25", "0.25"), ("50", "0.5"), ("75", "0.75")).map {
        case (t, p) =>
          s"""eb$t AS (SELECT ia AS a, ib AS b FROM wt, tq
             |         WHERE CAST(w AS DOUBLE) <= t$t
             |         UNION SELECT ib, ia FROM wt, tq
             |         WHERE CAST(w AS DOUBLE) <= t$t),
             |walk$t(id, lbl) AS (
             |  SELECT a, a FROM eb$t
             |  UNION
             |  SELECT e2.b, w2.lbl FROM walk$t w2 JOIN eb$t e2 ON e2.a = w2.id),
             |cp$t AS (SELECT id, MIN(lbl) AS comp FROM walk$t GROUP BY 1),
             |cs$t AS (SELECT comp, COUNT(*) AS sz FROM cp$t GROUP BY 1),
             |st$t AS (SELECT CAST($p AS DOUBLE) AS prob,
             |  (SELECT t$t FROM tq) AS tau,
             |  CAST((SELECT n FROM nn)
             |    - (COALESCE((SELECT SUM(sz) FROM cs$t), 0)
             |       - COALESCE((SELECT COUNT(*) FROM cs$t), 0)) AS BIGINT)
             |    AS n_clusters,
             |  CAST(COALESCE((SELECT SUM(sz) FROM cs$t), 0) AS BIGINT)
             |    AS clustered_nodes,
             |  CAST(COALESCE((SELECT MAX(sz) FROM cs$t), 1) AS BIGINT)
             |    AS largest_cluster)""".stripMargin
      }.mkString(",\n")
      s"""WITH RECURSIVE
         |cents AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id,
         |    embedding AS cent
         |  FROM embeddings ORDER BY vec_id
         |  LIMIT (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings)),
         |e AS (
         |  SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(x))) AS ma
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id,
         |    CASE WHEN ma > 0 THEN list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
         |           AS BIGINT))
         |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS v
         |  FROM e),
         |asg AS (
         |  SELECT e2.vec_id AS id, c.cent_id AS bucket,
         |    row_number() OVER (PARTITION BY e2.vec_id
         |      ORDER BY list_cosine_similarity(e2.embedding, c.cent) DESC,
         |        c.cent_id) AS r
         |  FROM embeddings e2, cents c),
         |qq AS MATERIALIZED (
         |  SELECT a.id, a.bucket, q.v
         |  FROM (SELECT id, bucket FROM asg WHERE r = 1) a
         |  JOIN q ON q.vec_id = a.id),
         |pr AS MATERIALIZED (
         |  SELECT a.id AS ia, bb.id AS ib,
         |    CAST(SUM((a.v[i + 1] - bb.v[i + 1]) * (a.v[i + 1] - bb.v[i + 1]))
         |      AS BIGINT) AS d
         |  FROM qq a JOIN qq bb ON a.bucket = bb.bucket AND a.id < bb.id,
         |    range(64) r(i)
         |  GROUP BY 1, 2),
         |ori AS (SELECT ia AS id, ib AS other, d FROM pr
         |        UNION ALL SELECT ib, ia, d FROM pr),
         |core AS MATERIALIZED (
         |  SELECT id, d AS core FROM (
         |    SELECT id, other, d,
         |      row_number() OVER (PARTITION BY id ORDER BY d, other) AS rn
         |    FROM ori) z WHERE rn = 4),
         |wt AS MATERIALIZED (
         |  SELECT p.ia, p.ib,
         |    GREATEST(p.d, COALESCE(ca.core, 1000000000),
         |      COALESCE(cb.core, 1000000000)) AS w
         |  FROM pr p LEFT JOIN core ca ON ca.id = p.ia
         |  LEFT JOIN core cb ON cb.id = p.ib),
         |tq AS (SELECT quantile_cont(CAST(w AS DOUBLE), 0.25) AS t25,
         |         quantile_cont(CAST(w AS DOUBLE), 0.5) AS t50,
         |         quantile_cont(CAST(w AS DOUBLE), 0.75) AS t75
         |       FROM wt),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
         |$blocks
         |SELECT * FROM st25 UNION ALL SELECT * FROM st50
         |UNION ALL SELECT * FROM st75
         |ORDER BY prob""".stripMargin
    },
    // per-treated argmin by correlated subquery — ABS-nearest within the
    // 1024-cent band, ties backward then max user (the asof dedupe rule);
    // disjoint formulation of the same match
    "q221_matching_att" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |p AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS pivot FROM ev),
        |pu AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN day < p.pivot THEN cents ELSE 0 END) AS pre,
        |    SUM(CASE WHEN day >= p.pivot THEN cents ELSE 0 END) AS post
        |  FROM ev, p GROUP BY 1),
        |tr AS (SELECT * FROM pu WHERE user_id % 2 = 1),
        |ct AS MATERIALIZED (SELECT * FROM pu WHERE user_id % 2 = 0),
        |mt AS (
        |  SELECT t.user_id, t.pre, t.post,
        |    (SELECT c.user_id FROM ct c
        |     WHERE c.pre // 1024 = t.pre // 1024
        |     ORDER BY ABS(c.pre - t.pre),
        |       CASE WHEN c.pre <= t.pre THEN 0 ELSE 1 END,
        |       c.user_id DESC
        |     LIMIT 1) AS cu
        |  FROM tr t),
        |j AS (SELECT m.user_id, m.pre, m.post, m.cu, c.pre AS cp, c.post AS co
        |      FROM mt m LEFT JOIN ct c ON c.user_id = m.cu)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_treated,
        |  CAST(COUNT(cu) AS BIGINT) AS n_matched,
        |  CAST(SUM(CASE WHEN cu IS NOT NULL THEN post - co END) AS DOUBLE)
        |    / CAST(COUNT(cu) AS DOUBLE) AS att_cents,
        |  CAST(SUM(CASE WHEN cu IS NOT NULL THEN pre - cp END) AS DOUBLE)
        |    / CAST(COUNT(cu) AS DOUBLE) AS mean_pre_gap
        |FROM j""".stripMargin,
    "q18_minhash_pairs" -> minhashOracleSql,
    // q18's candidate pair set labeled by source on both sides, rolled to
    // the source-pair grain (canonical least/greatest orientation)
    "q136_dup_matrix" -> {
      s"""WITH $minhashPipelineCte,
         |prs AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM sized a JOIN sized b
         |    ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
         |  WHERE a.bsz BETWEEN 2 AND 1000),
         |lab AS (SELECT doc_id, source FROM documents),
         |m AS (
         |  SELECT least(sa.source, sb.source) AS source_a,
         |    greatest(sa.source, sb.source) AS source_b
         |  FROM prs
         |  JOIN lab sa ON sa.doc_id = prs.id_a
         |  JOIN lab sb ON sb.doc_id = prs.id_b)
         |SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  (source_a <> source_b) AS cross_source
         |FROM m GROUP BY source_a, source_b
         |ORDER BY source_a, source_b""".stripMargin
    },
    // τ=0.5 temperature mix: isqrt replayed as corrected floor(sqrt);
    // every division a floor, same order as Mixing.ratesPpm
    "q137_temperature_mix" -> {
      val md5 = graft.functions.PortableHash.md5Hash60Sql("doc_id")
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS t
         |  FROM documents),
         |tot AS (SELECT source, CAST(SUM(t) AS BIGINT) AS st FROM d GROUP BY 1),
         |s0 AS (SELECT source, st,
         |        CAST(floor(sqrt(CAST(st AS DOUBLE))) AS BIGINT) AS s
         |       FROM tot),
         |sq AS (SELECT source, st,
         |        CASE WHEN (s + 1) * (s + 1) <= st THEN s + 1
         |             WHEN s * s > st THEN s - 1 ELSE s END AS w
         |       FROM s0),
         |g AS (SELECT CAST(SUM(st) // 2 AS BIGINT) AS budget,
         |        CAST(greatest(SUM(w), 1) AS BIGINT) AS wsum FROM sq),
         |r AS (SELECT source, st,
         |        CAST(w * 1000000 // g.wsum AS BIGINT) AS weight_ppm
         |      FROM sq, g),
         |r2 AS (SELECT source, weight_ppm,
         |        CAST(LEAST(1000000, ((g.budget * weight_ppm // 1000000) * 1000000)
         |          // greatest(st, 1)) AS BIGINT) AS rate_ppm
         |       FROM r, g),
         |kept AS (
         |  SELECT d.source, r2.weight_ppm, r2.rate_ppm, d.t
         |  FROM d JOIN r2 USING (source)
         |  WHERE ($md5 % 1000000) < r2.rate_ppm)
         |SELECT source, weight_ppm, rate_ppm,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(t) AS BIGINT) AS n_tokens
         |FROM kept GROUP BY 1, 2, 3 ORDER BY source""".stripMargin
    },
    // int8-quantized exact-integer cosine threshold (θ² = 9/100): the
    // whole predicate is BIGINT, so the flag set replays bit-for-bit
    "q138_semantic_decon" -> {
      def dotSql(a: String, b: String) =
        (1 to 64).map(i => s"$a[$i]*$b[$i]").mkString(" + ")
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(x))) AS ma
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id,
         |    CASE WHEN ma > 0 THEN list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
         |           AS BIGINT))
         |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS v
         |  FROM e),
         |n2 AS (SELECT vec_id, v, ${dotSql("v", "v")} AS nn FROM q),
         |p AS (
         |  SELECT c.vec_id AS cid, t.vec_id AS tid,
         |    ${dotSql("c.v", "t.v")} AS d, c.nn AS na, t.nn AS nb
         |  FROM n2 c JOIN n2 t ON c.vec_id >= 15 AND t.vec_id < 15)
         |SELECT cid AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_test_matches,
         |  CAST(MIN(tid) AS BIGINT) AS first_test_id
         |FROM p WHERE d > 0 AND d * d * 100 >= 9 * na * nb
         |GROUP BY 1 ORDER BY vec_id""".stripMargin
    },
    // two unrolled synchronous majority rounds over the q131 mutual-kNN
    // edges; winner = max count, ties to the smaller label; seeds clamped
    "q139_label_prop" ->
      s"""WITH $ivfMutualSqlCte,
        |und AS (
        |  SELECT id_a AS src, id_b AS dst FROM mut
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM mut),
        |n0 AS (
        |  SELECT vec_id,
        |    CASE WHEN vec_id % 4 = 0 THEN CAST(label AS BIGINT) END AS lab
        |  FROM embeddings),
        |v1 AS (
        |  SELECT dst, lab FROM (
        |    SELECT u.dst, s.lab,
        |      row_number() OVER (PARTITION BY u.dst
        |        ORDER BY COUNT(*) DESC, s.lab ASC) AS rn
        |    FROM und u JOIN n0 s ON s.vec_id = u.src AND s.lab IS NOT NULL
        |    GROUP BY u.dst, s.lab) WHERE rn = 1),
        |l1 AS (
        |  SELECT n.vec_id, COALESCE(n.lab, v.lab) AS lab,
        |    CASE WHEN n.lab IS NOT NULL THEN 0
        |         WHEN v.lab IS NOT NULL THEN 1 END AS rnd
        |  FROM n0 n LEFT JOIN v1 v ON v.dst = n.vec_id),
        |v2 AS (
        |  SELECT dst, lab FROM (
        |    SELECT u.dst, s.lab,
        |      row_number() OVER (PARTITION BY u.dst
        |        ORDER BY COUNT(*) DESC, s.lab ASC) AS rn
        |    FROM und u JOIN l1 s ON s.vec_id = u.src AND s.lab IS NOT NULL
        |    GROUP BY u.dst, s.lab) WHERE rn = 1),
        |l2 AS (
        |  SELECT n.vec_id, COALESCE(n.lab, v.lab) AS lab,
        |    COALESCE(n.rnd, CASE WHEN v.lab IS NOT NULL THEN 2 END) AS rnd
        |  FROM l1 n LEFT JOIN v2 v ON v.dst = n.vec_id)
        |SELECT vec_id, lab AS label, CAST(rnd AS BIGINT) AS round_assigned
        |FROM l2 ORDER BY vec_id""".stripMargin,
    // global-decile TV distance in integer ppm; NTILE tie-break (value,
    // doc_id) is groupedNtile's exact contract (the q77 parity)
    "q140_tv_drift" ->
      """WITH d AS (
        |  SELECT doc_id, source, CAST(length(text) AS BIGINT) AS v
        |  FROM documents),
        |b AS (
        |  SELECT source,
        |    CAST(NTILE(10) OVER (ORDER BY v, doc_id) AS BIGINT) AS bin
        |  FROM d),
        |cells AS (
        |  SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM b GROUP BY 1, 2),
        |grid AS (
        |  SELECT s.source, bb.bin
        |  FROM (SELECT DISTINCT source FROM cells) s,
        |       (SELECT DISTINCT bin FROM cells) bb),
        |dense AS (
        |  SELECT g.source, g.bin, COALESCE(c.n, 0) AS n
        |  FROM grid g LEFT JOIN cells c
        |    ON c.source = g.source AND c.bin = g.bin),
        |st AS (SELECT source, CAST(SUM(n) AS BIGINT) AS stn FROM dense GROUP BY 1),
        |bt AS (SELECT bin, CAST(SUM(n) AS BIGINT) AS btn FROM dense GROUP BY 1),
        |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM dense)
        |SELECT d.source, CAST(MAX(st.stn) AS BIGINT) AS n_docs,
        |  CAST(SUM(ABS((d.n * 1000000 // st.stn)
        |    - (bt.btn * 1000000 // tt.tot))) // 2 AS BIGINT) AS tv_ppm
        |FROM dense d
        |JOIN st ON st.source = d.source
        |JOIN bt ON bt.bin = d.bin, tt
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    // q47's recursive reachability components rolled up to token mass per
    // source; keeper rule = component == doc id (min label)
    "q142_dedup_roi" ->
      s"""WITH RECURSIVE $minhashPipelineCte,
         |mpairs AS (
         |  SELECT DISTINCT a.id AS ia, b.id AS ib
         |  FROM sized a JOIN sized b
         |    ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
         |  WHERE a.bsz BETWEEN 2 AND 1000),
         |edges AS (SELECT ia AS a, ib AS b FROM mpairs UNION SELECT ib, ia FROM mpairs),
         |walk(id, lbl) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.id),
         |comp AS (SELECT id, MIN(lbl) AS component FROM walk GROUP BY id),
         |tok AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS t
         |  FROM documents),
         |lab AS (
         |  SELECT tok.source, tok.t,
         |    (COALESCE(comp.component, tok.doc_id) <> tok.doc_id) AS dup
         |  FROM tok LEFT JOIN comp ON comp.id = tok.doc_id)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(t) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN dup THEN t ELSE 0 END) AS BIGINT) AS dup_tokens,
         |  CAST(SUM(CASE WHEN dup THEN t ELSE 0 END) * 1000000
         |    // greatest(SUM(t), 1) AS BIGINT) AS savings_ppm
         |FROM lab GROUP BY 1 ORDER BY source""".stripMargin,
    // ceil divisions in pure integer arithmetic, floor ppm overhead
    "q143_packing_efficiency" ->
      """WITH tok AS (
        |  SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS t
        |  FROM documents),
        |x AS (SELECT t, CAST(ctx AS BIGINT) AS ctx
        |      FROM tok, (VALUES (128), (512), (2048)) AS c(ctx))
        |SELECT ctx, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(t) AS BIGINT) AS n_tokens,
        |  CAST(SUM((t + ctx - 1) // ctx) AS BIGINT) AS n_seqs,
        |  CAST(SUM(((t + ctx - 1) // ctx) * ctx) AS BIGINT) AS padded_tokens,
        |  CAST(((SUM(((t + ctx - 1) // ctx) * ctx) - SUM(t)) * 1000000)
        |    // greatest(SUM(((t + ctx - 1) // ctx) * ctx), 1) AS BIGINT)
        |    AS overhead_ppm,
        |  CAST((SUM(t) + ctx - 1) // ctx AS BIGINT) AS ideal_seqs
        |FROM x GROUP BY ctx ORDER BY ctx""".stripMargin,
    // bounded top-10 tie-broken by key; 1-row folds, floor ppm shares
    "q144_skew_audit" ->
      """WITH c AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |t10 AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM
        |  (SELECT cnt FROM c ORDER BY cnt DESC, user_id LIMIT 10)),
        |a AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS k, CAST(MAX(cnt) AS BIGINT) AS mx
        |  FROM c)
        |SELECT n AS n_rows, k AS n_keys, mx AS max_cnt,
        |  CAST((mx * 1000000) // n AS BIGINT) AS max_share_ppm,
        |  CAST((t * 1000000) // n AS BIGINT) AS top10_mass_ppm,
        |  CAST(n // k AS BIGINT) AS mean_cnt
        |FROM a, t10""".stripMargin,
    // (group, token) grain then group grain; HUGEINT ppm mirrors the
    // Spark side's decimal(38,0) — both exact integer floor divisions
    "q145_simpson" ->
      """WITH toks AS (
        |  SELECT source,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |tc AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM toks GROUP BY 1, 2)
        |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(c * (c - 1)) AS BIGINT) AS repeat_pairs,
        |  CAST((CAST(SUM(c * (c - 1)) AS HUGEINT) * 1000000)
        |    // greatest(CAST(SUM(c) AS HUGEINT) * (SUM(c) - 1), 1) AS BIGINT)
        |    AS simpson_ppm
        |FROM tc GROUP BY 1 ORDER BY source""".stripMargin,
    // both rank chains replayed (q16 exact + q48 quantized), overlaps per
    // prefix depth, RBO in exact scaled integers (S = 960, max = 930)
    "q146_rbo" ->
      """WITH pairs AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS nid,
        |    list_cosine_similarity(q.embedding, c.embedding) AS cos
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |ta AS (SELECT qid, nid, rank FROM (
        |  SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |  FROM pairs) WHERE rank <= 5),
        |e2 AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(x))) AS ma
        |  FROM embeddings),
        |qv AS (
        |  SELECT vec_id,
        |    CASE WHEN ma > 0 THEN list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
        |           AS DOUBLE))
        |    ELSE list_transform(embedding, x -> CAST(0.0 AS DOUBLE)) END AS v
        |  FROM e2),
        |qp AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS nid,
        |    list_dot_product(a.v, b.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        |      AS cos
        |  FROM qv a JOIN qv b ON a.vec_id < 10 AND a.vec_id <> b.vec_id),
        |tb AS (SELECT qid, nid, rank FROM (
        |  SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |  FROM qp) WHERE rank <= 5),
        |j AS (SELECT ta.qid, ta.rank AS ra, tb.rank AS rb
        |      FROM ta JOIN tb ON ta.qid = tb.qid AND ta.nid = tb.nid),
        |ag AS (SELECT qid,
        |  CAST(SUM(CASE WHEN ra <= 1 AND rb <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS ov1,
        |  CAST(SUM(CASE WHEN ra <= 2 AND rb <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS ov2,
        |  CAST(SUM(CASE WHEN ra <= 3 AND rb <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS ov3,
        |  CAST(SUM(CASE WHEN ra <= 4 AND rb <= 4 THEN 1 ELSE 0 END) AS BIGINT) AS ov4,
        |  CAST(SUM(CASE WHEN ra <= 5 AND rb <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS ov5
        |  FROM j GROUP BY 1)
        |SELECT qs.qid AS query_id,
        |  COALESCE(ov1, 0) AS ov1, COALESCE(ov2, 0) AS ov2,
        |  COALESCE(ov3, 0) AS ov3, COALESCE(ov4, 0) AS ov4,
        |  COALESCE(ov5, 0) AS ov5,
        |  480 * COALESCE(ov1, 0) + 120 * COALESCE(ov2, 0)
        |    + 40 * COALESCE(ov3, 0) + 15 * COALESCE(ov4, 0)
        |    + 6 * COALESCE(ov5, 0) AS rbo_scaled,
        |  CAST(930 AS BIGINT) AS rbo_max
        |FROM (SELECT vec_id AS qid FROM embeddings WHERE vec_id < 10) qs
        |LEFT JOIN ag ON ag.qid = qs.qid ORDER BY query_id""".stripMargin,
    // mod vs rendezvous migration under 8 -> 9; rendezvous argmax replayed
    // as a rank-1 window (hash DESC, shard ASC — the max-struct tie-break)
    "q147_shard_stability" -> {
      val md5id = graft.functions.PortableHash.md5Hash60Sql("doc_id")
      val md5cat = graft.functions.PortableHash.md5Hash60Sql(
        "CAST(d.doc_id AS VARCHAR) || ':' || CAST(u.s AS VARCHAR)")
      s"""WITH d AS (SELECT doc_id FROM documents),
         |h AS (SELECT doc_id, $md5id AS hh FROM d),
         |rv8 AS (SELECT doc_id, s FROM (
         |  SELECT d.doc_id, u.s,
         |    row_number() OVER (PARTITION BY d.doc_id
         |      ORDER BY $md5cat DESC, u.s ASC) AS rn
         |  FROM d, unnest(generate_series(0, 7)) AS u(s)) WHERE rn = 1),
         |rv9 AS (SELECT doc_id, s FROM (
         |  SELECT d.doc_id, u.s,
         |    row_number() OVER (PARTITION BY d.doc_id
         |      ORDER BY $md5cat DESC, u.s ASC) AS rn
         |  FROM d, unnest(generate_series(0, 8)) AS u(s)) WHERE rn = 1),
         |m AS (
         |  SELECT h.doc_id,
         |    (h.hh % 8 <> h.hh % 9) AS mod_moved,
         |    (a8.s <> a9.s) AS rv_moved
         |  FROM h JOIN rv8 a8 USING (doc_id) JOIN rv9 a9 USING (doc_id)),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN mod_moved THEN 1 ELSE 0 END) AS BIGINT) AS m1,
         |  CAST(SUM(CASE WHEN rv_moved THEN 1 ELSE 0 END) AS BIGINT) AS m2
         |  FROM m)
         |SELECT 'mod' AS strategy, n AS n_docs, m1 AS n_moved,
         |  CAST((m1 * 1000000) // greatest(n, 1) AS BIGINT) AS moved_ppm FROM a
         |UNION ALL
         |SELECT 'rendezvous', n, m2,
         |  CAST((m2 * 1000000) // greatest(n, 1) AS BIGINT) FROM a
         |ORDER BY strategy""".stripMargin
    },
    // daily exact top-20 (count desc, key asc), survivors on >= 3 days
    "q148_persistent_hitters" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) * 1000 AS tns, user_id FROM events),
        |c AS (SELECT tns // 86400000000000 AS day, user_id,
        |        CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM e GROUP BY 1, 2),
        |r AS (SELECT day, user_id, cnt,
        |        row_number() OVER (PARTITION BY day
        |          ORDER BY cnt DESC, user_id ASC) AS rk
        |      FROM c)
        |SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS n_epochs_top,
        |  CAST(MIN(rk) AS BIGINT) AS best_rank,
        |  CAST(MAX(cnt) AS BIGINT) AS max_cnt
        |FROM r WHERE rk <= 20 GROUP BY 1 HAVING COUNT(*) >= 3
        |ORDER BY key""".stripMargin,
    // (source, token) distinct grain self-joined on token; union by
    // inclusion-exclusion, floor ppm
    "q149_source_jaccard" ->
      """WITH toks AS (
        |  SELECT source,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |st AS (SELECT DISTINCT source, tok FROM toks),
        |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM st GROUP BY 1),
        |i AS (SELECT a.source AS sa, b.source AS sb,
        |        CAST(COUNT(*) AS BIGINT) AS ni
        |      FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT sa AS source_a, sb AS source_b, ni AS n_inter,
        |  (za.n + zb.n - ni) AS n_union,
        |  CAST((ni * 1000000) // (za.n + zb.n - ni) AS BIGINT) AS jaccard_ppm
        |FROM i JOIN sz za ON za.source = i.sa JOIN sz zb ON zb.source = i.sb
        |ORDER BY source_a, source_b""".stripMargin,
    // closed-form Gini on the distinct-value grain (run of c equal values
    // v after cumulative a contributes v*(c*a + c(c+1)/2) to sum i*x_i);
    // HUGEINT mirrors the Spark side's decimal(38,0)
    "q150_length_gini" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
        |  FROM documents),
        |g AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c
        |      FROM d GROUP BY 1, 2),
        |r AS (SELECT source, v, c,
        |        CAST(COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c, 0)
        |          AS BIGINT) AS a
        |      FROM g),
        |s1 AS (SELECT source,
        |        CAST(SUM(c) AS BIGINT) AS n,
        |        CAST(SUM(v * c) AS BIGINT) AS total,
        |        SUM(CAST(v AS HUGEINT) * (CAST(c AS HUGEINT) * a
        |          + (CAST(c AS HUGEINT) * (c + 1)) // 2)) AS S1
        |      FROM r GROUP BY 1)
        |SELECT source, n, total,
        |  CAST(CASE WHEN n * total > 0 THEN
        |    ((2 * S1 - CAST(n + 1 AS HUGEINT) * total) * 1000000)
        |      // (CAST(n AS HUGEINT) * total) END AS BIGINT) AS gini_ppm
        |FROM s1 ORDER BY source""".stripMargin,
    // rightmost-min winnowing selection via the hash*1e9 + (1e9-1-pos)
    // encoding; per-source gram mass from the doc lists, floor-ppm density
    "q151_winnow_density" ->
      s"""WITH $winnowSelCte,
         |fp AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nf FROM sel GROUP BY 1),
         |gm AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(greatest(len(t) - 3, 0)) AS BIGINT) AS n_grams
         |       FROM d GROUP BY 1),
         |fs AS (SELECT d.source, CAST(SUM(fp.nf) AS BIGINT) AS nf
         |       FROM d JOIN fp USING (doc_id) GROUP BY 1)
         |SELECT gm.source, n_docs, n_grams,
         |  CAST(COALESCE(fs.nf, 0) AS BIGINT) AS n_fp,
         |  CASE WHEN n_grams > 0 THEN
         |    CAST((COALESCE(fs.nf, 0) * 1000000) // n_grams AS BIGINT)
         |  END AS density_ppm
         |FROM gm LEFT JOIN fs ON fs.source = gm.source
         |ORDER BY gm.source""".stripMargin,
    // distinct (doc, hash) grain; hash recovered as mc // 1e9; the df <=
    // 1000 gate replays the operator's maxBucket flood cap
    "q152_winnow_pairs" ->
      s"""WITH $winnowSelCte,
         |fps AS (SELECT DISTINCT doc_id,
         |          CAST(mc // 1000000000 AS BIGINT) AS h FROM sel),
         |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM fps GROUP BY 1),
         |cap AS (SELECT doc_id, h FROM (
         |          SELECT doc_id, h, COUNT(*) OVER (PARTITION BY h) AS df FROM fps)
         |        WHERE df <= 1000),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(COUNT(*) AS BIGINT) AS n_shared
         |       FROM cap a JOIN cap b ON a.h = b.h AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2 HAVING COUNT(*) >= 2)
         |SELECT doc_a, doc_b, n_shared,
         |  CAST((n_shared * 1000000) // least(za.n, zb.n) AS BIGINT)
         |    AS containment_ppm
         |FROM pr JOIN sz za ON za.doc_id = pr.doc_a
         |        JOIN sz zb ON zb.doc_id = pr.doc_b
         |ORDER BY doc_a, doc_b""".stripMargin,
    // 2x2 confusion per source; kappa numerator can be NEGATIVE, so the
    // floor division is emulated via the pmod identity (DuckDB //
    // truncates toward zero); pe and n*n in HUGEINT
    "q153_gate_kappa" ->
      s"""WITH gop AS (SELECT doc_id, pass FROM ($gopherRulesSql)),
         |cur AS (SELECT doc_id, keep FROM ($curationGateSql)),
         |j AS (SELECT dd.source, g.pass AS a, c.keep AS b
         |      FROM documents dd JOIN gop g USING (doc_id)
         |           JOIN cur c USING (doc_id)),
         |cf AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         |         CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS nao,
         |         CAST(SUM(CASE WHEN b AND NOT a THEN 1 ELSE 0 END) AS BIGINT) AS nbo,
         |         CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS nn
         |       FROM j GROUP BY 1),
         |k AS (SELECT source, n, nb, nao, nbo, nn,
         |        (CAST(nb + nao AS HUGEINT) * (nb + nbo)
         |          + CAST(nbo + nn AS HUGEINT) * (nao + nn)) AS pe,
         |        (CAST(n AS HUGEINT) * (nb + nn)) AS agree_n
         |      FROM cf)
         |SELECT source, n, nb AS n_both, nao AS n_a_only, nbo AS n_b_only,
         |  nn AS n_neither,
         |  CAST(((nb + nn) * 1000000) // n AS BIGINT) AS po_ppm,
         |  CASE WHEN CAST(n AS HUGEINT) * n - pe <> 0 THEN CAST(
         |    ((agree_n - pe) * 1000000
         |      - ((((agree_n - pe) * 1000000) % (CAST(n AS HUGEINT) * n - pe)
         |          + (CAST(n AS HUGEINT) * n - pe))
         |         % (CAST(n AS HUGEINT) * n - pe)))
         |      // (CAST(n AS HUGEINT) * n - pe) AS BIGINT)
         |  END AS kappa_ppm
         |FROM k ORDER BY source""".stripMargin,
    // midrank rank-sum on the (source, n_chars) distinct grain; u2 =
    // 2*U1 >= 0 so plain // is already floor
    "q154_length_auc" ->
      s"""WITH cur AS (SELECT doc_id, keep FROM ($curationGateSql)),
         |dj AS (SELECT dd.source, dd.n_chars AS v, c.keep
         |       FROM documents dd JOIN cur c USING (doc_id)),
         |g AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c,
         |        CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS c1
         |      FROM dj GROUP BY 1, 2),
         |r AS (SELECT source, v, c, c1,
         |        CAST(COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY v
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c, 0)
         |          AS BIGINT) AS a
         |      FROM g),
         |s AS (SELECT source, CAST(SUM(c1) AS BIGINT) AS n_pos,
         |        CAST(SUM(c - c1) AS BIGINT) AS n_neg,
         |        SUM(CAST(c1 AS HUGEINT) * (2 * a + c + 1)) AS r2
         |      FROM r GROUP BY 1)
         |SELECT source, n_pos, n_neg,
         |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         |    CAST(((r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1)) * 1000000)
         |      // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
         |  END AS auc_ppm
         |FROM s ORDER BY source""".stripMargin,
    // dense (pooled-value x source) grid; sup of the cross-multiplied CDF
    // gap, numerator in HUGEINT; floor-ppm on the max
    "q155_ks_drift" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
        |  FROM documents),
        |kv AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM d GROUP BY 1, 2),
        |p AS (SELECT v, CAST(SUM(c) AS BIGINT) AS cp FROM kv GROUP BY 1),
        |ks AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM kv GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cp) AS BIGINT) AS np FROM p),
        |grid AS (SELECT k.source, p.v, p.cp, COALESCE(kv.c, 0) AS cs, k.ns
        |         FROM p CROSS JOIN ks k
        |         LEFT JOIN kv ON kv.source = k.source AND kv.v = p.v),
        |cums AS (SELECT source, ns,
        |           SUM(cs) OVER (PARTITION BY source ORDER BY v
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cums,
        |           SUM(cp) OVER (PARTITION BY source ORDER BY v
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cump
        |         FROM grid),
        |mx AS (SELECT source, CAST(MIN(ns) AS BIGINT) AS n,
        |         MAX(abs(CAST(cums AS HUGEINT) * (SELECT np FROM tot)
        |           - CAST(cump AS HUGEINT) * ns)) AS mn
        |       FROM cums GROUP BY 1)
        |SELECT source, n,
        |  CAST((mn * 1000000)
        |    // (CAST(n AS HUGEINT) * (SELECT np FROM tot)) AS BIGINT) AS ks_ppm
        |FROM mx ORDER BY source""".stripMargin,
    // doubled midranks from the (key, value) grain joined back to rows;
    // HUGEINT co-moment sums cast to double, then q103's fixed IEEE tail
    "q156_spearman" ->
      """WITH c AS (
        |  SELECT l_returnflag AS k,
        |    CAST(ROUND(l_quantity * 100.0) AS BIGINT) AS x,
        |    CAST(ROUND(l_extendedprice * 100.0) AS BIGINT) AS y
        |  FROM lineitem),
        |gx AS (SELECT k, x, CAST(COUNT(*) AS BIGINT) AS c FROM c GROUP BY 1, 2),
        |rx AS (SELECT k, x,
        |         2 * CAST(COALESCE(SUM(c) OVER (PARTITION BY k ORDER BY x
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c, 0)
        |           AS BIGINT) + c + 1 AS r
        |       FROM gx),
        |gy AS (SELECT k, y, CAST(COUNT(*) AS BIGINT) AS c FROM c GROUP BY 1, 2),
        |ry AS (SELECT k, y,
        |         2 * CAST(COALESCE(SUM(c) OVER (PARTITION BY k ORDER BY y
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c, 0)
        |           AS BIGINT) + c + 1 AS r
        |       FROM gy),
        |j AS (SELECT c.k, rx.r AS a, ry.r AS b
        |      FROM c JOIN rx ON rx.k = c.k AND rx.x = c.x
        |             JOIN ry ON ry.k = c.k AND ry.y = c.y),
        |s AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(CAST(a AS HUGEINT)) AS DOUBLE) AS sx,
        |        CAST(SUM(CAST(b AS HUGEINT)) AS DOUBLE) AS sy,
        |        CAST(SUM(CAST(a AS HUGEINT) * a) AS DOUBLE) AS sxx,
        |        CAST(SUM(CAST(b AS HUGEINT) * b) AS DOUBLE) AS syy,
        |        CAST(SUM(CAST(a AS HUGEINT) * b) AS DOUBLE) AS sxy
        |      FROM j GROUP BY 1)
        |SELECT k AS l_returnflag, n,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |    (n * sxy - sx * sy)
        |      / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |  END AS rho
        |FROM s ORDER BY l_returnflag""".stripMargin,
    // fixed floor-ppm Benford literals; dense 9-digit grid per key so
    // absent digits report share 0
    "q157_benford" ->
      """WITH v AS (
        |  SELECT o_orderpriority AS pri,
        |    CAST(floor(o_totalprice) AS BIGINT) AS fv
        |  FROM orders WHERE floor(o_totalprice) >= 1),
        |d AS (SELECT pri,
        |        CAST(substring(CAST(fv AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |      FROM v),
        |c AS (SELECT pri, digit, CAST(COUNT(*) AS BIGINT) AS n_d
        |      FROM d GROUP BY 1, 2),
        |tot AS (SELECT pri, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
        |bf AS (SELECT * FROM (VALUES (1, 301029), (2, 176091), (3, 124938),
        |         (4, 96910), (5, 79181), (6, 66946), (7, 57991),
        |         (8, 51152), (9, 45757)) AS t(digit, benford_ppm))
        |SELECT tot.pri, CAST(bf.digit AS BIGINT) AS digit,
        |  CAST(COALESCE(c.n_d, 0) AS BIGINT) AS n_d,
        |  CAST((COALESCE(c.n_d, 0) * 1000000) // tot.n AS BIGINT) AS share_ppm,
        |  CAST(bf.benford_ppm AS BIGINT) AS benford_ppm,
        |  CAST(abs((COALESCE(c.n_d, 0) * 1000000) // tot.n - bf.benford_ppm)
        |    AS BIGINT) AS dev_ppm
        |FROM tot CROSS JOIN bf
        |LEFT JOIN c ON c.pri = tot.pri AND c.digit = bf.digit
        |ORDER BY tot.pri, bf.digit""".stripMargin,
    // closed [s,e] intervals -> +1 at s, -1 at e+1; the oracle affords the
    // global ordered cumulative the engine decomposes into two levels
    "q158_max_concurrency" ->
      s"""WITH sess AS (
         |  SELECT session_start_us AS s, session_end_us AS e
         |  FROM ($sessionOracleSql)),
         |d AS (SELECT s AS t, 1 AS net FROM sess
         |      UNION ALL SELECT e + 1, -1 FROM sess),
         |tg AS (SELECT t, CAST(SUM(net) AS BIGINT) AS net FROM d GROUP BY 1),
         |c AS (SELECT t, net,
         |        SUM(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM tg)
         |SELECT t // 86400000000 AS day, CAST(COUNT(*) AS BIGINT) AS n_changes,
         |  CAST(MAX(cum) AS BIGINT) AS max_concurrency
         |FROM c GROUP BY 1 ORDER BY day""".stripMargin,
    // the salted join's contract IS the plain join: same rows, same agg
    "q159_salted_join" ->
      """SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(ROUND(l.l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |GROUP BY 1 ORDER BY p_brand""".stripMargin,
    // generated 16-step rotation CTE chain mirrors withHilbert2 column
    // for column; Morton from the shared zValue2Sql generator
    "q160_hilbert_locality" -> {
      val zsql = graft.operators.Layout.zValue2Sql("cx", "cy", 16)
      val hctes = graft.operators.Layout.hilbert2SqlCtes("hin", 16, Seq("cx", "cy"))
      s"""WITH cells AS (
         |  SELECT DISTINCT l_suppkey AS cx, l_partkey AS cy FROM lineitem),
         |hin AS (SELECT cx, cy, cx AS hx, cy AS hy FROM cells),
         |$hctes,
         |hz AS (SELECT 'hilbert' AS strategy, cx, cy, hd AS idx FROM hil16
         |       UNION ALL
         |       SELECT 'zorder', cx, cy, $zsql FROM cells),
         |lg AS (SELECT strategy, cx, cy,
         |         LAG(cx) OVER (PARTITION BY strategy, idx >> 14
         |           ORDER BY idx) AS px,
         |         LAG(cy) OVER (PARTITION BY strategy, idx >> 14
         |           ORDER BY idx) AS py
         |       FROM hz)
         |SELECT strategy, CAST(COUNT(*) AS BIGINT) AS n_cells,
         |  CAST(SUM(CASE WHEN px IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_steps,
         |  CAST(SUM(CASE WHEN px IS NULL THEN 0
         |            ELSE abs(cx - px) + abs(cy - py) END) AS BIGINT)
         |    AS total_jump
         |FROM lg GROUP BY 1 ORDER BY strategy""".stripMargin
    },
    // the pipeline CTE's sh table IS the shingle grain; pairs from the
    // q18/q136 band derivation; exact Jaccard by (id_b, shingle) join
    "q162_lsh_precision" ->
      s"""WITH $minhashPipelineCte,
         |prs AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM sized a JOIN sized b
         |    ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
         |  WHERE a.bsz BETWEEN 2 AND 1000),
         |shd AS (SELECT DISTINCT id, s FROM sh),
         |sz AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM shd GROUP BY 1),
         |i AS (SELECT p.id_a, p.id_b, CAST(COUNT(*) AS BIGINT) AS ni
         |      FROM prs p JOIN shd a ON a.id = p.id_a
         |                 JOIN shd b ON b.id = p.id_b AND b.s = a.s
         |      GROUP BY 1, 2)
         |SELECT p.id_a, p.id_b,
         |  CAST(COALESCE(i.ni, 0) AS BIGINT) AS n_inter,
         |  CAST(za.n + zb.n - COALESCE(i.ni, 0) AS BIGINT) AS n_union,
         |  CAST((COALESCE(i.ni, 0) * 1000000)
         |    // (za.n + zb.n - COALESCE(i.ni, 0)) AS BIGINT) AS jaccard_ppm,
         |  ((COALESCE(i.ni, 0) * 1000000)
         |    // (za.n + zb.n - COALESCE(i.ni, 0))) >= 500000 AS verified
         |FROM prs p LEFT JOIN i ON i.id_a = p.id_a AND i.id_b = p.id_b
         |JOIN sz za ON za.id = p.id_a JOIN sz zb ON zb.id = p.id_b
         |ORDER BY p.id_a, p.id_b""".stripMargin,
    // q47's recursive components + token mass; keeper = rank-1 by
    // (n_tok desc, id asc) — the max-struct tie-break
    "q163_quality_keeper" ->
      s"""WITH comp AS ($dedupGroupsOracleSql),
         |tk AS (SELECT doc_id AS id,
         |         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
         |           AS n_tok
         |       FROM documents),
         |j AS (SELECT c.component, c.id, t.n_tok
         |      FROM comp c JOIN tk t USING (id)),
         |r AS (SELECT component, id, n_tok,
         |        row_number() OVER (PARTITION BY component
         |          ORDER BY n_tok DESC, id ASC) AS rk
         |      FROM j)
         |SELECT component, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(MIN(CASE WHEN rk = 1 THEN id END) AS BIGINT) AS keeper_doc,
         |  CAST(MIN(CASE WHEN rk = 1 THEN n_tok END) AS BIGINT) AS keeper_toks,
         |  CAST(SUM(n_tok) AS BIGINT) AS total_toks,
         |  CAST(SUM(n_tok) - MIN(CASE WHEN rk = 1 THEN n_tok END) AS BIGINT)
         |    AS saved_toks
         |FROM r GROUP BY component ORDER BY component""".stripMargin,
    // q47's recursive components (singletons self-labeled) + survivorship:
    // mode via two-level count + (count desc, value asc) rank — the same
    // deterministic tie GoldenRecord.modePerCluster pins
    "q174_golden_record" ->
      s"""WITH comp AS ($dedupGroupsOracleSql),
         |lab AS (
         |  SELECT d.doc_id, d.source, d.lang, d.n_chars,
         |    coalesce(c.component, d.doc_id) AS cluster
         |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
         |base AS (
         |  SELECT cluster, CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
         |    CAST(COUNT(*) AS BIGINT) AS n_members,
         |    CAST(MAX(n_chars) AS BIGINT) AS n_chars_max
         |  FROM lab GROUP BY 1),
         |sc AS (SELECT cluster, source, count(*) AS c FROM lab GROUP BY 1, 2),
         |sm AS (SELECT cluster, source AS source_gold FROM (
         |         SELECT cluster, source,
         |           row_number() OVER (PARTITION BY cluster
         |             ORDER BY c DESC, source ASC) AS r
         |         FROM sc) t WHERE r = 1),
         |lc AS (SELECT cluster, lang, count(*) AS c FROM lab GROUP BY 1, 2),
         |lm AS (SELECT cluster, lang AS lang_gold FROM (
         |         SELECT cluster, lang,
         |           row_number() OVER (PARTITION BY cluster
         |             ORDER BY c DESC, lang ASC) AS r
         |         FROM lc) t WHERE r = 1)
         |SELECT base.cluster, base.canonical_id, base.n_members,
         |  base.n_chars_max, sm.source_gold, lm.lang_gold
         |FROM base JOIN sm USING (cluster) JOIN lm USING (cluster)
         |ORDER BY cluster""".stripMargin,
    // q101's basket shape at the part grain + degree join; cos^2 in
    // HUGEINT, total-ordered top-50
    "q166_item_cosine" ->
      """WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |f AS (SELECT i FROM bi GROUP BY i HAVING COUNT(*) >= 3),
        |bf AS (SELECT b, i FROM bi WHERE i IN (SELECT i FROM f)),
        |p AS (SELECT a.i AS item_a, b2.i AS item_b,
        |        CAST(COUNT(*) AS BIGINT) AS pair_count
        |      FROM bf a JOIN bf b2 ON a.b = b2.b AND a.i < b2.i
        |      GROUP BY 1, 2),
        |pp AS (SELECT * FROM p WHERE pair_count >= 3),
        |d AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS d FROM bi GROUP BY 1)
        |SELECT item_a, item_b, pair_count, da.d AS d_a, db.d AS d_b,
        |  CAST((CAST(pair_count AS HUGEINT) * pair_count * 1000000)
        |    // (CAST(da.d AS HUGEINT) * db.d) AS BIGINT) AS cos2_ppm
        |FROM pp JOIN d da ON da.i = pp.item_a JOIN d db ON db.i = pp.item_b
        |ORDER BY cos2_ppm DESC, item_a, item_b LIMIT 50""".stripMargin,
    // total-ordered (t, event_id) lag; one aggregate unpivoted to the
    // 4-horizon curve
    "q167_repurchase_curve" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id
        |  FROM events WHERE event_type = 'purchase'),
        |l AS (SELECT t - LAG(t) OVER (PARTITION BY user_id
        |        ORDER BY t, event_id) AS gap FROM p),
        |g AS (SELECT gap FROM l WHERE gap IS NOT NULL),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN gap <= 86400000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS c1,
        |  CAST(SUM(CASE WHEN gap <= 604800000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS c7,
        |  CAST(SUM(CASE WHEN gap <= 1209600000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS c14,
        |  CAST(SUM(CASE WHEN gap <= 2592000000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS c30
        |  FROM g)
        |SELECT k_days, n AS n_gaps, c AS n_within,
        |  CAST((c * 1000000) // n AS BIGINT) AS within_ppm
        |FROM (
        |  SELECT CAST(1 AS BIGINT) AS k_days, n, c1 AS c FROM a
        |  UNION ALL SELECT 7, n, c7 FROM a
        |  UNION ALL SELECT 14, n, c14 FROM a
        |  UNION ALL SELECT 30, n, c30 FROM a)
        |ORDER BY k_days""".stripMargin,
    // full-join of the two value grains; same cross-multiplied sup as
    // q155, single comparison
    "q168_ks_two_sample" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
        |  FROM documents),
        |ga AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS ca FROM d
        |       WHERE doc_id % 8 < 4 GROUP BY 1),
        |gb AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cb FROM d
        |       WHERE doc_id % 8 >= 4 GROUP BY 1),
        |g AS (SELECT COALESCE(ga.v, gb.v) AS v, COALESCE(ca, 0) AS ca,
        |        COALESCE(cb, 0) AS cb
        |      FROM ga FULL JOIN gb ON ga.v = gb.v),
        |c AS (SELECT v,
        |        SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
        |        SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb,
        |        SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
        |      FROM g)
        |SELECT CAST(MIN(na) AS BIGINT) AS n_a, CAST(MIN(nb) AS BIGINT) AS n_b,
        |  CAST((MAX(abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na))
        |    * 1000000) // (CAST(MIN(na) AS HUGEINT) * MIN(nb)) AS BIGINT)
        |    AS ks_ppm
        |FROM c""".stripMargin,
    // sig CTE carries m0..m31; agreement = generated 32-term CASE sum;
    // exact side reuses q162's shingle-join shape; floor-mean per bin
    "q169_minhash_calibration" -> {
      val agree = (0 until 32)
        .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $minhashPipelineCte,
         |prs AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM sized a JOIN sized b
         |    ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
         |  WHERE a.bsz BETWEEN 2 AND 1000),
         |m AS (SELECT p.id_a, p.id_b, CAST($agree AS BIGINT) AS est_matches
         |      FROM prs p JOIN sig a ON a.id = p.id_a
         |                 JOIN sig b ON b.id = p.id_b),
         |shd AS (SELECT DISTINCT id, s FROM sh),
         |sz AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM shd GROUP BY 1),
         |i AS (SELECT p.id_a, p.id_b, CAST(COUNT(*) AS BIGINT) AS ni
         |      FROM prs p JOIN shd a ON a.id = p.id_a
         |                 JOIN shd b ON b.id = p.id_b AND b.s = a.s
         |      GROUP BY 1, 2),
         |jp AS (SELECT m.est_matches,
         |         (COALESCE(i.ni, 0) * 1000000)
         |           // (za.n + zb.n - COALESCE(i.ni, 0)) AS jppm
         |       FROM m LEFT JOIN i ON i.id_a = m.id_a AND i.id_b = m.id_b
         |       JOIN sz za ON za.id = m.id_a JOIN sz zb ON zb.id = m.id_b)
         |SELECT est_matches,
         |  CAST((est_matches * 1000000) // 32 AS BIGINT) AS est_ppm,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(jppm) // COUNT(*) AS BIGINT) AS avg_true_ppm
         |FROM jp GROUP BY 1 ORDER BY est_matches""".stripMargin
    },
    // global running-max lateness; the oracle affords the one-partition
    // window the engine decomposes into two levels
    "q170_lateness_audit" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS t FROM events),
        |r AS (SELECT event_id, t,
        |        MAX(t) OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS rm
        |      FROM e)
        |SELECT event_id // 4096 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN rm - t > 300000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_late,
        |  CAST(MAX(rm - t) AS BIGINT) AS max_lateness
        |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin,
    // midranks on the (source, value) grain joined back to docs
    "q164_percentile_normalize" ->
      """WITH g AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT source, v, c,
        |        CAST(COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c, 0)
        |          AS BIGINT) AS a,
        |        CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n
        |      FROM g),
        |p AS (SELECT source, v,
        |        CAST(((2 * a + c + 1) * 1000000) // (2 * n) AS BIGINT)
        |          AS pct_ppm
        |      FROM r)
        |SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars,
        |  p.pct_ppm
        |FROM documents d JOIN p ON p.source = d.source AND p.v = d.n_chars
        |ORDER BY d.doc_id""".stripMargin,
    // frequency-of-frequency grain; whole levels assigned by integer
    // cross-multiplied 50%/90% preceding-mass thresholds
    "q165_zipf_segments" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |tc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1),
        |ff AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS nt,
        |         CAST(c * COUNT(*) AS BIGINT) AS mass
        |       FROM tc GROUP BY 1),
        |r AS (SELECT c, nt, mass,
        |        CAST(COALESCE(SUM(mass) OVER (ORDER BY c DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS HUGEINT) AS prev,
        |        CAST(SUM(mass) OVER () AS HUGEINT) AS m
        |      FROM ff),
        |s AS (SELECT c, nt, mass, m,
        |        CASE WHEN 2 * prev < m THEN '1_head'
        |             WHEN 10 * prev < 9 * m THEN '2_middle'
        |             ELSE '3_tail' END AS segment
        |      FROM r)
        |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_levels,
        |  CAST(SUM(nt) AS BIGINT) AS n_terms,
        |  CAST(SUM(mass) AS BIGINT) AS mass,
        |  CAST((CAST(SUM(mass) AS HUGEINT) * 1000000) // MAX(m) AS BIGINT)
        |    AS mass_ppm,
        |  CAST(MIN(c) AS BIGINT) AS min_freq,
        |  CAST(MAX(c) AS BIGINT) AS max_freq
        |FROM s GROUP BY 1 ORDER BY segment""".stripMargin,
    // constant-key ntile == plain NTILE over (value, id); keep flags from
    // the shared curation CTE
    "q161_gate_calibration" ->
      s"""WITH cur AS (SELECT doc_id, keep FROM ($curationGateSql)),
         |t AS (SELECT doc_id, source,
         |        CAST(NTILE(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
         |          AS decile
         |      FROM documents),
         |j AS (SELECT t.source, t.decile, cur.keep
         |      FROM t JOIN cur USING (doc_id))
         |SELECT source, decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |  CAST((SUM(CASE WHEN keep THEN 1 ELSE 0 END) * 1000000) // COUNT(*)
         |    AS BIGINT) AS keep_ppm
         |FROM j GROUP BY 1, 2 ORDER BY source, decile""".stripMargin,
    // first-appearance epoch per distinct 3-gram; novelty in floor ppm
    "q141_ngram_novelty" ->
      """WITH d AS (
        |  SELECT doc_id % 8 AS epoch,
        |    string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT epoch, w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS gram
        |  FROM d, unnest(generate_series(1, len(w) - 2)) AS u(i)
        |  WHERE len(w) >= 3),
        |f AS (SELECT gram, MIN(epoch) AS fe FROM g GROUP BY 1)
        |SELECT CAST(epoch AS BIGINT) AS epoch,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |  CAST(SUM(CASE WHEN epoch = fe THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST((SUM(CASE WHEN epoch = fe THEN 1 ELSE 0 END) * 1000000)
        |    // COUNT(*) AS BIGINT) AS novelty_ppm
        |FROM g JOIN f USING (gram) GROUP BY 1 ORDER BY epoch""".stripMargin,
    // q90: greedy-earliest funnel — each step's min is strictly after the
    // prior step's; both engines compare in the shared epoch-µs domain
    // (DuckDB reads parquet TIMESTAMP(NANOS) at µs precision).
    // q96 folds the same funnel incrementally over a time-split — the
    // ordered-batch state update must reproduce the full recompute, so it
    // shares the oracle verbatim.
    "q90_funnel" -> funnelOracleSql,
    "q96_funnel_inc" -> funnelOracleSql,
    // q90's funnel as a CTE; 2x2 chi-square on exact HUGEINT products,
    // one double division (z^2 on proportions is the same statistic)
    "q199_funnel_ab" ->
      s"""WITH f AS ($funnelOracleSql),
         |cc AS (SELECT user_id % 2 AS arm,
         |         (steps_completed >= 3 AND t3_us - t1_us <= 86400000000) AS conv
         |       FROM f),
         |t AS (SELECT
         |  CAST(SUM(CASE WHEN arm = 0 AND conv THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |  CAST(SUM(CASE WHEN arm = 0 AND NOT conv THEN 1 ELSE 0 END) AS BIGINT) AS b,
         |  CAST(SUM(CASE WHEN arm = 1 AND conv THEN 1 ELSE 0 END) AS BIGINT) AS c,
         |  CAST(SUM(CASE WHEN arm = 1 AND NOT conv THEN 1 ELSE 0 END) AS BIGINT) AS d
         |  FROM cc),
         |r AS (SELECT a + b AS n_0, a AS conv_0, c + d AS n_1, c AS conv_1,
         |  CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE) AS rate_0,
         |  CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE) AS rate_1,
         |  CASE WHEN a + b > 0 AND c + d > 0 AND a + c > 0 AND b + d > 0 THEN
         |    CAST(CAST(a + b + c + d AS HUGEINT) *
         |      ((CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c) *
         |       (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)) AS DOUBLE)
         |    / CAST(CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d)
         |        AS DOUBLE)
         |  ELSE 0.0 END AS chi2
         |  FROM t)
         |SELECT n_0, conv_0, n_1, conv_1, rate_0, rate_1, chi2,
         |  (chi2 > 3.841458820694124) AS significant FROM r""".stripMargin,
    // bounded shard grain; the rank window runs on 40 rows only
    "q200_makespan_balance" ->
      """WITH sh AS (
        |  SELECT doc_id % 40 AS shard,
        |    CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS w
        |  FROM documents GROUP BY 1),
        |h AS (SELECT shard % 8 AS worker, SUM(w) AS load FROM sh GROUP BY 1),
        |s1 AS (SELECT 'hash' AS strategy, CAST(8 AS INTEGER) AS workers,
        |  CAST(MAX(load) AS BIGINT) AS makespan,
        |  CAST(SUM(load) AS BIGINT) AS total,
        |  CAST(MAX(load) AS DOUBLE) / (CAST(SUM(load) AS DOUBLE) / 8.0)
        |    AS imbalance
        |  FROM h),
        |r AS (SELECT w, shard,
        |        (row_number() OVER (ORDER BY w DESC, shard) - 1) % 8 AS worker
        |      FROM sh),
        |l AS (SELECT worker, SUM(w) AS load FROM r GROUP BY 1),
        |s2 AS (SELECT 'sorted_rr' AS strategy, CAST(8 AS INTEGER) AS workers,
        |  CAST(MAX(load) AS BIGINT) AS makespan,
        |  CAST(SUM(load) AS BIGINT) AS total,
        |  CAST(MAX(load) AS DOUBLE) / (CAST(SUM(load) AS DOUBLE) / 8.0)
        |    AS imbalance
        |  FROM l)
        |SELECT * FROM s1 UNION ALL SELECT * FROM s2 ORDER BY strategy""".stripMargin,
    // q91: all-integer day/week grid (epoch_ns // ns-per-day), distinct
    // users per cell via the two-level aggregate
    "q91_retention" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS d FROM events),
        |f AS (SELECT user_id, MIN(d) AS d0 FROM e GROUP BY user_id),
        |g AS (
        |  SELECT f.d0 // 7 AS cohort_week, (e.d - f.d0) // 7 AS week_offset,
        |    e.user_id, COUNT(*) AS n
        |  FROM e JOIN f USING (user_id) GROUP BY 1, 2, 3)
        |SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
        |  CAST(week_offset AS BIGINT) AS week_offset,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(n) AS BIGINT) AS n_events
        |FROM g GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,
    // q92: the two-pass MG output is exactly the items above n/(k+1)
    // (k=29), so the oracle is the plain exact threshold query
    "q92_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM t),
        |c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY tok)
        |SELECT c.tok, c.c, n.n_total FROM c, n
        |WHERE c.c * 30 > n.n_total
        |ORDER BY c.c DESC, c.tok""".stripMargin,
    // q94: lag ordered by (µs, event_id) — the engine-shared total order;
    // p is exact n / conditional-total division
    "q94_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |c AS (
        |  SELECT prev AS prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM e WHERE prev IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, event_type, n,
        |  CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type) AS p
        |FROM c ORDER BY prev_type, event_type""".stripMargin,
    // q95: NTILE ties broken by user_id; monetary via the exact-cents
    // decimal-sum policy (q01 idiom)
    "q95_rfm" ->
      """WITH u AS (
        |  SELECT user_id,
        |    MAX(epoch_ns(ts) // 86400000000000) AS dmax,
        |    CAST(COUNT(*) AS BIGINT) AS frequency,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS m_dec
        |  FROM events GROUP BY user_id),
        |g AS (SELECT MAX(dmax) AS gmax FROM u),
        |t AS (
        |  SELECT u.user_id,
        |    CAST(g.gmax - u.dmax AS BIGINT) AS recency_days,
        |    u.frequency, u.m_dec,
        |    CAST(NTILE(4) OVER (ORDER BY g.gmax - u.dmax, u.user_id)
        |      AS BIGINT) AS r_tile,
        |    CAST(NTILE(4) OVER (ORDER BY u.frequency, u.user_id)
        |      AS BIGINT) AS f_tile,
        |    CAST(NTILE(4) OVER (ORDER BY u.m_dec, u.user_id)
        |      AS BIGINT) AS m_tile
        |  FROM u, g)
        |SELECT user_id, recency_days, frequency,
        |  CAST(m_dec AS DOUBLE) AS monetary, r_tile, f_tile, m_tile,
        |  CAST(r_tile AS VARCHAR) || '-' || CAST(f_tile AS VARCHAR) || '-' ||
        |    CAST(m_tile AS VARCHAR) AS segment
        |FROM t ORDER BY user_id""".stripMargin,
    // q93: vocab = top-20 en-slice terms by (count desc, term); coverage
    // is one exact-int / exact-int double division
    "q93_vocab_coverage" ->
      """WITH tk AS (
        |  SELECT doc_id, lang,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |v AS (
        |  SELECT term FROM (
        |    SELECT term, COUNT(*) AS n FROM tk WHERE lang = 'en'
        |    GROUP BY term ORDER BY n DESC, term LIMIT 20)),
        |c AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) FILTER (WHERE term IN (SELECT term FROM v))
        |      AS BIGINT) AS in_vocab
        |  FROM tk GROUP BY doc_id)
        |SELECT d.doc_id, d.lang, c.n_tokens, c.in_vocab,
        |  CAST(c.in_vocab AS DOUBLE) / c.n_tokens AS coverage,
        |  CAST(c.in_vocab AS DOUBLE) / c.n_tokens >= 0.65 AS pass
        |FROM documents d JOIN c USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // distinct-signature grain: identical docs collapse BEFORE banding,
    // exactly what the probe (and the harvest) count
    "q86_minhash_stats" ->
      s"""WITH $minhashPipelineCte,
         |dsig AS (SELECT DISTINCT sig, bno, bk FROM banded),
         |occ AS (
         |  SELECT bno, bk, CAST(COUNT(*) AS BIGINT) AS occ
         |  FROM dsig GROUP BY 1, 2)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |  CAST(SUM(occ) AS BIGINT) AS n_sig_band_rows,
         |  CAST(MAX(occ) AS BIGINT) AS max_occ,
         |  CAST(SUM(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_multi_buckets,
         |  CAST(SUM(occ * (occ - 1) / 2) AS BIGINT) AS pair_work
         |FROM occ""".stripMargin,
    "q19_simhash" ->
      s"""WITH $simhashSqlCte
         |SELECT id, simhash, simhash >> 45 AS bucket FROM sim ORDER BY id""".stripMargin,
    // brute-force Hamming join == the banded pairing by pigeonhole
    // completeness (<= 3 differing bits leave >= 1 of 4 blocks intact)
    "q43_simhash_pairs" ->
      s"""WITH $simhashSqlCte
         |SELECT a.id AS id_a, b.id AS id_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sim a JOIN sim b ON a.id < b.id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    "q33_embedding_neardup" -> embNearDupOracleSql,
    "q47_dedup_groups" -> dedupGroupsOracleSql,
    // q17's centroid/assignment replay + q33's exact-double cosine scoring
    // + q47's recursive reachability, composed: cluster-scoped pairs only.
    "q67_semantic_dedup" ->
      """WITH RECURSIVE cents AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id, embedding AS cent
        |  FROM embeddings ORDER BY vec_id
        |  LIMIT (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings)),
        |asg AS (
        |  SELECT e.vec_id AS id, list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v,
        |         c.cent_id AS bucket,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC, c.cent_id) AS r
        |  FROM embeddings e, cents c),
        |b AS (SELECT id, v, bucket FROM asg WHERE r = 1),
        |sized AS (SELECT *, COUNT(*) OVER (PARTITION BY bucket) AS bsz FROM b),
        |mp AS (
        |  SELECT a.id AS ia, bb.id AS ib
        |  FROM sized a JOIN sized bb ON a.bucket = bb.bucket AND a.id < bb.id
        |  WHERE a.bsz BETWEEN 2 AND 10000
        |    AND list_dot_product(a.v, bb.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(bb.v, bb.v)))
        |      >= CAST(0.42 AS DOUBLE)),
        |edges AS (SELECT ia AS a, ib AS b FROM mp UNION SELECT ib, ia FROM mp),
        |walk(id, lbl) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e2.b, w.lbl FROM walk w JOIN edges e2 ON e2.a = w.id),
        |comp AS (SELECT id, min(lbl) AS component FROM walk GROUP BY id)
        |SELECT b.id, coalesce(comp.component, b.id) AS component,
        |  coalesce(comp.component, b.id) = b.id AS is_keeper
        |FROM b LEFT JOIN comp USING (id) ORDER BY id""".stripMargin,
    // the oracle groups on window STRINGS where Spark groups on their
    // md5Hash60 — identical grouping absent 60-bit collisions
    "q68_dup_spans" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |win AS (
        |  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS s
        |  FROM d, unnest(generate_series(1, len(t) - 7)) AS u(i)
        |  WHERE len(t) >= 8),
        |pd AS (SELECT s, doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM win GROUP BY 1, 2),
        |nd AS (SELECT s, doc_id, c, COUNT(*) OVER (PARTITION BY s) AS ndocs FROM pd)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_windows,
        |  CAST(SUM(CASE WHEN ndocs >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_windows,
        |  CAST(SUM(CASE WHEN ndocs >= 2 THEN c ELSE 0 END) AS DOUBLE) / SUM(c) AS dup_frac
        |FROM nd GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // same window-string grouping as q68; the island sum replays the
    // fixed-width interval union (new span when the start gap exceeds 8)
    // shared by q85 (hash-screen algorithm) and q116 (prefix-doubling
    // algorithm): both must equal the brute-force window formulation
    "q85_dup_span_ranges" -> dupSpanRangesOracle,
    "q116_sa_dup_ranges" -> dupSpanRangesOracle,
    // per-dim rank chains on prefix-sliced lists (q16's membership-margin
    // argument), full-list left join so zero-overlap probes still report
    "q122_trunc_recall" -> {
      val dimBlocks = Seq(8, 16, 32).map { d =>
        s"""SELECT f.query_id, $d AS dim,
           |  CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_overlap,
           |  CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
           |    AS DOUBLE) / 5 AS recall
           |FROM fullk f LEFT JOIN (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY q.qid
           |        ORDER BY list_cosine_similarity(q.qv[1:$d], c.embedding[1:$d])
           |          DESC, c.vec_id) AS r
           |    FROM q JOIN embeddings c ON c.vec_id <> q.qid) z WHERE r <= 5
           |) t ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
           |GROUP BY f.query_id""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv
         |           FROM embeddings WHERE vec_id < 10),
         |fullk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.qid
         |        ORDER BY list_cosine_similarity(q.qv, c.embedding) DESC,
         |          c.vec_id) AS r
         |    FROM q JOIN embeddings c ON c.vec_id <> q.qid) z WHERE r <= 5)
         |$dimBlocks
         |ORDER BY query_id, dim""".stripMargin
    },
    // bigram-grain left join against the even-slice count model; both
    // scores are exact-long / exact-long single divisions
    "q123_lm_familiarity" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, t[i] AS x, t[i+1] AS y
        |  FROM d, unnest(generate_series(1, len(t) - 1)) AS u(i)
        |  WHERE len(t) >= 2),
        |ref AS (
        |  SELECT x, y, COUNT(*) AS rc FROM bg WHERE doc_id % 2 = 0
        |  GROUP BY x, y HAVING COUNT(*) >= 2),
        |sc AS (
        |  SELECT bg.doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(CASE WHEN ref.rc IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_matched,
        |    CAST(SUM(COALESCE(ref.rc, 0)) AS BIGINT) AS ref_mass
        |  FROM bg LEFT JOIN ref ON ref.x = bg.x AND ref.y = bg.y
        |  GROUP BY bg.doc_id)
        |SELECT doc_id, n_bigrams, n_matched, ref_mass,
        |  CAST(n_matched AS DOUBLE) / n_bigrams AS coverage,
        |  CAST(ref_mass AS DOUBLE) / n_bigrams AS familiarity
        |FROM sc ORDER BY doc_id""".stripMargin,
    // portable md5 bucket hash + fixed-point `//` ratio replays the Spark
    // `div` arithmetic bit-for-bit; rank ties broken by doc_id both sides
    "q124_dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, (lang = 'en') AS tgt,
        |    (('0x' || substring(md5(CAST(tok AS VARCHAR)), 2, 15))::BIGINT)
        |      % 256 AS b
        |  FROM (SELECT doc_id, lang,
        |          unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |        FROM documents)),
        |dist AS (
        |  SELECT b, COUNT(*) AS cr,
        |    SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
        |  FROM toks GROUP BY b),
        |ds AS (SELECT b, (ct * 1000000) // cr AS s FROM dist),
        |sc AS (
        |  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(SUM(ds.s) AS BIGINT) AS w_sum
        |  FROM toks t JOIN ds ON ds.b = t.b GROUP BY t.doc_id)
        |SELECT
        |  CAST(row_number() OVER (
        |    ORDER BY CAST(w_sum AS DOUBLE) / n_tokens DESC, doc_id)
        |    AS BIGINT) AS rank,
        |  doc_id, n_tokens, w_sum,
        |  CAST(w_sum AS DOUBLE) / n_tokens AS importance
        |FROM sc ORDER BY rank LIMIT 100""".stripMargin,
    "q128_lsh_recall" -> lshRecallOracleSql,
    "q130_pq_recall" -> pqRecallOracleSql,
    // both rank chains replayed, mutuality as a self-join of the bounded
    // top-k table on the reversed pair
    "q132_ivf_pq_recall" -> ivfPqRecallOracleSql,
    // q54's lag-gap sessions with (ts, id) ordering; first_value/lag
    // attribution inside the session partition
    "q135_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
        |  FROM events),
        |g AS (
        |  SELECT *, SUM(CASE WHEN pd IS NULL OR tus - pd >= 21600000000
        |                     THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY tus, event_id
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM (SELECT *, LAG(tus) OVER (
        |          PARTITION BY user_id ORDER BY tus, event_id) AS pd
        |        FROM e)),
        |a AS (
        |  SELECT user_id, event_id, event_type, tus,
        |    first_value(event_type) OVER (
        |      PARTITION BY user_id, sid ORDER BY tus, event_id
        |      ROWS UNBOUNDED PRECEDING) AS first_touch,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id, sid ORDER BY tus, event_id) AS last_touch,
        |    row_number() OVER (
        |      PARTITION BY user_id, sid ORDER BY tus, event_id) - 1
        |      AS n_prior
        |  FROM g)
        |SELECT user_id, event_id AS conv_event_id, tus AS conv_ts_us,
        |  first_touch, last_touch, CAST(n_prior AS BIGINT) AS n_prior_events
        |FROM a WHERE event_type = 'purchase'
        |ORDER BY user_id, conv_ts_us, conv_event_id""".stripMargin,
    // (group, token)-grain then group-grain — exact longs, two divisions
    "q134_lexical_profile" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |tc AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2)
        |SELECT source,
        |  CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  CAST(COUNT(*) AS DOUBLE) / SUM(c) AS ttr,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
        |    AS hapax_frac
        |FROM tc GROUP BY source ORDER BY source""".stripMargin,
    // q171's IVF mutual edges + q47/q67's recursive min-label reachability
    "q133_knn_clusters" ->
      s"""WITH RECURSIVE $ivfMutualSqlCte,
        |edges AS (SELECT id_a AS a, id_b AS b FROM mut
        |          UNION SELECT id_b, id_a FROM mut),
        |walk(id, lbl) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e2.b, w.lbl FROM walk w JOIN edges e2 ON e2.a = w.id),
        |comp AS (SELECT id, min(lbl) AS component FROM walk GROUP BY id)
        |SELECT e.vec_id AS id,
        |  coalesce(comp.component, e.vec_id) AS component,
        |  coalesce(comp.component, e.vec_id) = e.vec_id AS is_keeper
        |FROM embeddings e LEFT JOIN comp ON comp.id = e.vec_id
        |ORDER BY id""".stripMargin,
    "q131_mutual_knn" ->
      """WITH pairs AS (
        |  SELECT a.vec_id AS qid, c.vec_id AS nid,
        |    list_cosine_similarity(a.embedding, c.embedding) AS cos
        |  FROM embeddings a JOIN embeddings c ON c.vec_id <> a.vec_id),
        |topk AS (
        |  SELECT qid, nid, rank FROM (
        |    SELECT qid, nid, row_number() OVER (
        |      PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |    FROM pairs) WHERE rank <= 5)
        |SELECT f.qid AS id_a, f.nid AS id_b,
        |  CAST(f.rank AS BIGINT) AS rank_ab, CAST(r.rank AS BIGINT) AS rank_ba
        |FROM topk f JOIN topk r ON r.qid = f.nid AND r.nid = f.qid
        |WHERE f.qid < f.nid ORDER BY id_a, id_b""".stripMargin,
    // IVF twin of q131: one assignment CTE serves both the corpus bucketing
    // (r = 1) and the probe lists (r <= nprobe) — the same (cos desc,
    // cent_id) ordering graft's nearestCentroid/probeBuckets pin
    "q171_mutual_knn_ivf" ->
      s"""WITH $ivfMutualSqlCte
         |SELECT id_a, id_b,
         |  CAST(rank_ab AS BIGINT) AS rank_ab, CAST(rank_ba AS BIGINT) AS rank_ba
         |FROM mut ORDER BY id_a, id_b""".stripMargin,
    // q171's candidate chain minus mutuality, plus label joins: the
    // label-agreement audit over the same IVF top-5 lists
    "q175_knn_label_purity" ->
      s"""WITH $ivfTopkSqlCte
        |SELECT t.qid AS vec_id, ql.label,
        |  CAST(count(*) AS BIGINT) AS n_neighbors,
        |  CAST(sum(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_same,
        |  CAST(sum(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS purity
        |FROM topk t
        |JOIN embeddings ql ON ql.vec_id = t.qid
        |JOIN embeddings nl ON nl.vec_id = t.nid
        |GROUP BY 1, 2 ORDER BY vec_id""".stripMargin,
    // greedy max-coverage unrolled: q68's span screen -> affected docs ->
    // overlapping src:/lang: slices -> 3 argmax rounds, each discounting
    // the already-covered subset (the same ties and emptiness rule as
    // SetCover.greedyMaxCoverage: a round with no uncovered rows vanishes)
    "q176_set_cover" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |win AS (
        |  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS s
        |  FROM d, unnest(generate_series(1, len(t) - 7)) AS u(i)
        |  WHERE len(t) >= 8),
        |pd AS (SELECT DISTINCT s, doc_id FROM win),
        |nd AS (SELECT s FROM pd GROUP BY s HAVING COUNT(*) >= 2),
        |aff AS (SELECT DISTINCT doc_id FROM pd WHERE s IN (SELECT s FROM nd)),
        |memb AS (
        |  SELECT DISTINCT doc_id, slice FROM (
        |    SELECT a.doc_id, 'src:' || dd.source AS slice
        |    FROM aff a JOIN documents dd USING (doc_id)
        |    UNION ALL
        |    SELECT a.doc_id, 'lang:' || dd.lang
        |    FROM aff a JOIN documents dd USING (doc_id)) t0),
        |r1 AS (SELECT slice, COUNT(*) AS c FROM memb
        |       GROUP BY 1 ORDER BY c DESC, slice LIMIT 1),
        |cov1 AS (SELECT DISTINCT doc_id FROM memb
        |         WHERE slice IN (SELECT slice FROM r1)),
        |r2 AS (SELECT slice, COUNT(*) AS c FROM memb
        |       WHERE doc_id NOT IN (SELECT doc_id FROM cov1)
        |       GROUP BY 1 ORDER BY c DESC, slice LIMIT 1),
        |cov2 AS (SELECT DISTINCT doc_id FROM memb
        |         WHERE slice IN (SELECT slice FROM r1 UNION SELECT slice FROM r2)),
        |r3 AS (SELECT slice, COUNT(*) AS c FROM memb
        |       WHERE doc_id NOT IN (SELECT doc_id FROM cov2)
        |       GROUP BY 1 ORDER BY c DESC, slice LIMIT 1),
        |allr AS (
        |  SELECT 1 AS round, slice AS picked_set, CAST(c AS BIGINT) AS newly_covered FROM r1
        |  UNION ALL SELECT 2, slice, CAST(c AS BIGINT) FROM r2
        |  UNION ALL SELECT 3, slice, CAST(c AS BIGINT) FROM r3)
        |SELECT CAST(round AS INTEGER) AS round, picked_set, newly_covered,
        |  CAST(SUM(newly_covered) OVER (ORDER BY round) AS BIGINT)
        |    AS cumulative_covered
        |FROM allr ORDER BY round""".stripMargin,
    // q94's per-user (µs, event_id) total order; EXISTS-based A-priori
    // prune mirrors the two semi-joins
    "q177_seq_trigrams" ->
      """WITH e AS (
        |  SELECT user_id AS u, event_type AS t1,
        |    lead(event_type, 1) OVER w AS t2,
        |    lead(event_type, 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)),
        |bg AS (SELECT t1 AS b1, t2 AS b2 FROM e WHERE t2 IS NOT NULL
        |       GROUP BY 1, 2 HAVING COUNT(DISTINCT u) >= 5),
        |tri AS (
        |  SELECT * FROM e
        |  WHERE t3 IS NOT NULL
        |    AND EXISTS (SELECT 1 FROM bg WHERE b1 = e.t1 AND b2 = e.t2)
        |    AND EXISTS (SELECT 1 FROM bg WHERE b1 = e.t2 AND b2 = e.t3))
        |SELECT t1, t2, t3, CAST(COUNT(DISTINCT u) AS BIGINT) AS support,
        |  CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |FROM tri GROUP BY 1, 2, 3 HAVING COUNT(DISTINCT u) >= 5
        |ORDER BY t1, t2, t3""".stripMargin,
    // CUPED: exact HUGEINT moments (Spark carries them in decimal(38,0) —
    // both are exact integers), doubles only in the final scalar formulas
    // with identical association
    "q178_cuped" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |p AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS pivot FROM ev),
        |pu AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN day < p.pivot THEN cents ELSE 0 END) AS xc,
        |    SUM(CASE WHEN day >= p.pivot THEN cents ELSE 0 END) AS yc
        |  FROM ev, p GROUP BY user_id),
        |g AS (
        |  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(xc) AS HUGEINT) AS sx, CAST(SUM(yc) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(xc AS HUGEINT) * yc) AS HUGEINT) AS sxy,
        |    CAST(SUM(CAST(xc AS HUGEINT) * xc) AS HUGEINT) AS sxx
        |  FROM pu),
        |th AS (SELECT
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx_all FROM g),
        |pg AS (SELECT user_id % 2 AS grp, COUNT(*) AS n_users,
        |    CAST(SUM(xc) AS HUGEINT) AS sxg, CAST(SUM(yc) AS HUGEINT) AS syg
        |  FROM pu GROUP BY 1)
        |SELECT CAST(grp AS BIGINT) AS grp, CAST(n_users AS BIGINT) AS n_users,
        |  CAST(sxg AS DOUBLE) / CAST(n_users AS DOUBLE) / 100.0 AS mean_pre,
        |  CAST(syg AS DOUBLE) / CAST(n_users AS DOUBLE) / 100.0 AS mean_post,
        |  (CAST(syg AS DOUBLE) / CAST(n_users AS DOUBLE)
        |    - theta * (CAST(sxg AS DOUBLE) / CAST(n_users AS DOUBLE) - mx_all))
        |    / 100.0 AS mean_adjusted,
        |  theta
        |FROM pg, th ORDER BY grp""".stripMargin,
    // three quantile_cont replays of the exact-median kernel (q106's
    // proven parity) on the deseasonalized residual chain
    "q180_seasonal_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(COUNT(*) AS DOUBLE) AS n
        |  FROM events GROUP BY 1, 2),
        |m1 AS (SELECT event_type, day % 7 AS dow,
        |         quantile_cont(n, 0.5) AS expected
        |       FROM daily GROUP BY 1, 2),
        |r AS (SELECT d.event_type, d.day, d.n, m1.expected,
        |        d.n - m1.expected AS residual
        |      FROM daily d JOIN m1
        |        ON m1.event_type = d.event_type AND m1.dow = d.day % 7),
        |m2 AS (SELECT event_type, quantile_cont(residual, 0.5) AS med_resid
        |       FROM r GROUP BY 1),
        |r2 AS (SELECT r.*, m2.med_resid FROM r JOIN m2 USING (event_type)),
        |m3 AS (SELECT event_type,
        |         quantile_cont(ABS(residual - med_resid), 0.5) AS mad
        |       FROM r2 GROUP BY 1)
        |SELECT r2.event_type, r2.day, CAST(r2.n AS BIGINT) AS n, r2.expected,
        |  r2.residual, r2.med_resid, m3.mad,
        |  (ABS(r2.residual - r2.med_resid) > 3.0 * m3.mad) AS is_anomaly
        |FROM r2 JOIN m3 USING (event_type)
        |ORDER BY event_type, day""".stripMargin,
    // q115's edge rule; apex-capped wedge join replayed verbatim (full
    // degrees in the jaccard denominator, capped apexes in the numerator)
    "q181_common_neighbors" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (
        |  SELECT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |adj AS (SELECT u AS apex, v AS nb FROM e
        |        UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT apex AS node, CAST(COUNT(*) AS BIGINT) AS degree
        |        FROM adj GROUP BY 1),
        |capped AS (
        |  SELECT a.apex, a.nb FROM adj a JOIN deg d ON d.node = a.apex
        |  WHERE d.degree <= 128),
        |cn AS (
        |  SELECT w1.nb AS a, w2.nb AS b, CAST(COUNT(*) AS BIGINT) AS common_neighbors
        |  FROM capped w1 JOIN capped w2 ON w1.apex = w2.apex AND w1.nb < w2.nb
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |ed AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b, true AS is_e
        |       FROM e)
        |SELECT cn.a AS id_a, cn.b AS id_b, cn.common_neighbors,
        |  da.degree AS deg_a, db.degree AS deg_b,
        |  CAST(cn.common_neighbors AS DOUBLE)
        |    / CAST(da.degree + db.degree - cn.common_neighbors AS DOUBLE)
        |    AS jaccard,
        |  coalesce(ed.is_e, false) AS is_edge
        |FROM cn
        |JOIN deg da ON da.node = cn.a
        |JOIN deg db ON db.node = cn.b
        |LEFT JOIN ed ON ed.a = cn.a AND ed.b = cn.b
        |ORDER BY id_a, id_b""".stripMargin,
    // q55's interval CTE over the non-purchase stream; purchases joined at
    // their own time AND at "current" — the correction-report rollup
    "q182_aswas_asis" ->
      """WITH c AS (
        |  SELECT user_id, epoch_us(ts) AS t, MAX(event_type) AS status
        |  FROM events WHERE event_type <> 'purchase' GROUP BY 1, 2),
        |l AS (
        |  SELECT user_id, t, status,
        |    LAG(status) OVER (PARTITION BY user_id ORDER BY t) AS ps
        |  FROM c),
        |ch AS (SELECT user_id, t, status FROM l WHERE ps IS NULL OR ps <> status),
        |iv AS (
        |  SELECT user_id, status, t AS vf,
        |    LEAD(t) OVER (PARTITION BY user_id ORDER BY t) AS vt
        |  FROM ch),
        |f AS (SELECT user_id, epoch_us(ts) AS tf FROM events
        |      WHERE event_type = 'purchase'),
        |aswas AS (
        |  SELECT f.user_id, f.tf, d.status AS s_aswas
        |  FROM f LEFT JOIN iv d ON d.user_id = f.user_id
        |    AND d.vf <= f.tf AND (d.vt IS NULL OR f.tf < d.vt)),
        |asis AS (SELECT user_id, status AS s_asis FROM iv WHERE vt IS NULL),
        |j AS (SELECT a.*, i.s_asis FROM aswas a LEFT JOIN asis i USING (user_id))
        |SELECT coalesce(s_aswas, 'none') AS status_aswas,
        |  coalesce(s_asis, 'none') AS status_asis,
        |  CAST(COUNT(*) AS BIGINT) AS n_facts,
        |  coalesce(s_aswas, 'none') <> coalesce(s_asis, 'none') AS changed
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the ensemble spec prints itself as SQL — one source of truth for
    // both engines; features mirrored expression-for-expression
    "q185_tree_scoring" -> {
      val featSql: String => String = {
        case "n_chars" => "nc"
        case "n_tokens" => "nt"
        case "avg_len" => "al"
      }
      s"""WITH f AS (
         |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS nc,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS nt
         |  FROM documents),
         |f2 AS (SELECT doc_id, nc, nt, nc / nt AS al FROM f)
         |SELECT doc_id, ${qualityEnsemble.sql(featSql)} AS margin,
         |  (${qualityEnsemble.sql(featSql)} > 0.0) AS accept
         |FROM f2 ORDER BY doc_id""".stripMargin
    },
    // integer-unit fold (associative — fold order can't matter), one
    // final division mirrored on both sides
    "q186_hashed_linear" ->
      s"""SELECT doc_id,
         |  ${graft.operators.Scoring.hashedLinearMarginSql(
                "text", hashedWeightUnits, 5000L, 100000.0)} AS margin,
         |  (${graft.operators.Scoring.hashedLinearMarginSql(
                "text", hashedWeightUnits, 5000L, 100000.0)} > 0.0) AS flagged
         |FROM documents ORDER BY doc_id""".stripMargin,
    // LOO arithmetic mirrored term-for-term (exact integer counts, one
    // double division); singletons null in both engines
    "q187_target_encoding" ->
      """WITH j AS (
        |  SELECT o.o_orderkey, c.c_mktsegment AS segment,
        |    (o.o_orderpriority = '1-URGENT') AS urgent
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |s AS (SELECT segment, COUNT(*) AS n,
        |        SUM(CASE WHEN urgent THEN 1 ELSE 0 END) AS pos
        |      FROM j GROUP BY 1)
        |SELECT j.o_orderkey, j.segment, j.urgent,
        |  CASE WHEN s.n > 1 THEN
        |    (CAST(s.pos - (CASE WHEN j.urgent THEN 1 ELSE 0 END) AS DOUBLE) + 1.0)
        |      / (CAST(s.n - 1 AS DOUBLE) + 2.0)
        |  END AS enc
        |FROM j JOIN s USING (segment) ORDER BY o_orderkey""".stripMargin,
    // per-zone lag windows replayed verbatim; doubles only in the two
    // final ratios
    "q188_rle_audit" ->
      """WITH li AS (
        |  SELECT l_orderkey AS k, l_linenumber AS ln, l_returnflag AS v
        |  FROM lineitem),
        |n1 AS (SELECT CAST((k - k % 1000) / 1000 AS BIGINT) AS z, v, k, ln FROM li),
        |m1 AS (SELECT z,
        |         CASE WHEN lag(v) OVER w IS NULL OR lag(v) OVER w <> v
        |           THEN 1 ELSE 0 END AS nw
        |       FROM n1 WINDOW w AS (PARTITION BY z ORDER BY k, ln, v)),
        |m2 AS (SELECT v AS z,
        |         CASE WHEN lag(v) OVER w IS NULL OR lag(v) OVER w <> v
        |           THEN 1 ELSE 0 END AS nw
        |       FROM li WINDOW w AS (PARTITION BY v ORDER BY k, ln, v)),
        |s1 AS (SELECT 'natural' AS layout, CAST(COUNT(DISTINCT z) AS BIGINT) AS zones,
        |         CAST(COUNT(*) AS BIGINT) AS rows_, CAST(SUM(nw) AS BIGINT) AS runs,
        |         CAST(COUNT(*) AS DOUBLE) / CAST(SUM(nw) AS DOUBLE) AS avg_run_len,
        |         CAST(SUM(nw) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS rle_ratio
        |       FROM m1),
        |s2 AS (SELECT 'by_value' AS layout, CAST(COUNT(DISTINCT z) AS BIGINT) AS zones,
        |         CAST(COUNT(*) AS BIGINT) AS rows_, CAST(SUM(nw) AS BIGINT) AS runs,
        |         CAST(COUNT(*) AS DOUBLE) / CAST(SUM(nw) AS DOUBLE) AS avg_run_len,
        |         CAST(SUM(nw) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS rle_ratio
        |       FROM m2)
        |SELECT layout, zones, rows_ AS "rows", runs, avg_run_len, rle_ratio
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2) t
        |ORDER BY layout""".stripMargin,
    // relational bloom: salted md5 positions; the position set and every
    // probe replay exactly (60-bit md5 values are non-negative, so % is
    // pmod)
    "q189_bloom_fpr" -> {
      val h = graft.functions.PortableHash.md5Hash60Sql(
        "CAST(j AS VARCHAR) || ':' || CAST(key AS VARCHAR)")
      s"""WITH dim AS (SELECT p_partkey AS key FROM part WHERE p_size >= 48),
         |pr AS (SELECT p_partkey AS key FROM part WHERE p_size < 48),
         |posset AS (
         |  SELECT DISTINCT ($h) % 512 AS pos
         |  FROM dim, generate_series(0, 2) AS g(j)),
         |pp AS (
         |  SELECT key, ($h) % 512 AS pos
         |  FROM pr, generate_series(0, 2) AS g(j)),
         |hit AS (
         |  SELECT pp.key, COUNT(*) AS np,
         |    SUM(CASE WHEN pp.pos IN (SELECT pos FROM posset)
         |      THEN 1 ELSE 0 END) AS nh
         |  FROM pp GROUP BY 1)
         |SELECT CAST(512 AS INTEGER) AS m, CAST(3 AS INTEGER) AS k,
         |  (SELECT CAST(COUNT(DISTINCT key) AS BIGINT) FROM dim) AS n_build,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM posset) AS n_bits_set,
         |  CAST(COUNT(*) AS BIGINT) AS n_probe,
         |  CAST(SUM(CASE WHEN np = nh THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_false_positive,
         |  CAST(SUM(CASE WHEN np = nh THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS fpr
         |FROM hit""".stripMargin
    },
    // order-independent HUGEINT checksum sums (Spark carries decimal(38,0));
    // IS NOT DISTINCT FROM is the null-safe twin of Spark's <=>
    "q190_checksum_reconcile" -> {
      val h = graft.functions.PortableHash.md5Hash60Sql(
        "concat_ws(':', event_id, user_id, event_type)")
      s"""WITH ev AS (
         |  SELECT event_id, user_id, event_type,
         |    epoch_ns(ts) // 86400000000000 AS day
         |  FROM events),
         |b AS (SELECT * FROM ev WHERE event_id % 101 <> 0),
         |da AS (SELECT day AS part, CAST(COUNT(*) AS BIGINT) AS n_a,
         |         SUM(CAST(($h) AS HUGEINT)) AS ck_a
         |       FROM ev GROUP BY 1),
         |db AS (SELECT day AS part, CAST(COUNT(*) AS BIGINT) AS n_b,
         |         SUM(CAST(($h) AS HUGEINT)) AS ck_b
         |       FROM b GROUP BY 1)
         |SELECT coalesce(da.part, db.part) AS part,
         |  coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
         |  (coalesce(n_a, 0) = coalesce(n_b, 0)
         |    AND ck_a IS NOT DISTINCT FROM ck_b) AS match_ok
         |FROM da FULL OUTER JOIN db ON db.part = da.part
         |ORDER BY part""".stripMargin
    },
    // delta-grain maintenance: the oracle recomputes both aggregates and
    // keeps only batch-touched groups — equality proves delta == rebuild
    "q191_view_maintenance" ->
      """WITH ev AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day, event_type, event_id
        |  FROM events),
        |store AS (
        |  SELECT day, event_type, CAST(COUNT(*) AS BIGINT) AS old_n
        |  FROM ev WHERE event_id % 17 <> 0 GROUP BY 1, 2),
        |add AS (
        |  SELECT day, event_type, CAST(COUNT(*) AS BIGINT) AS add_n
        |  FROM ev WHERE event_id % 17 = 0 GROUP BY 1, 2)
        |SELECT a.day, a.event_type,
        |  coalesce(s.old_n, 0) AS old_n,
        |  coalesce(s.old_n, 0) + a.add_n AS new_n,
        |  a.add_n AS delta_n
        |FROM add a LEFT JOIN store s USING (day, event_type)
        |ORDER BY day, event_type""".stripMargin,
    // exact HUGEINT moments; head/tail split at the same (count desc,
    // user) rank; doubles only in the estimate composition and ratio
    "q192_join_estimate" ->
      """WITH c AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1),
        |r AS (SELECT *, row_number() OVER (ORDER BY c DESC, user_id) AS rnk FROM c),
        |a AS (
        |  SELECT
        |    CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS f2,
        |    CAST(SUM(CASE WHEN rnk <= 10 THEN CAST(c AS HUGEINT) * c
        |      ELSE 0 END) AS HUGEINT) AS head_f2,
        |    CAST(SUM(CASE WHEN rnk > 10 THEN c ELSE 0 END) AS BIGINT) AS tail_n,
        |    CAST(SUM(CASE WHEN rnk > 10 THEN 1 ELSE 0 END) AS BIGINT) AS tail_d
        |  FROM r)
        |SELECT CAST(f2 AS DOUBLE) AS true_f2,
        |  (CAST(head_f2 AS DOUBLE) +
        |    CASE WHEN tail_d > 0 THEN
        |      CAST(CAST(tail_n AS HUGEINT) * tail_n AS DOUBLE)
        |        / CAST(tail_d AS DOUBLE)
        |    ELSE 0.0 END) AS est_f2,
        |  ((CAST(head_f2 AS DOUBLE) +
        |    CASE WHEN tail_d > 0 THEN
        |      CAST(CAST(tail_n AS HUGEINT) * tail_n AS DOUBLE)
        |        / CAST(tail_d AS DOUBLE)
        |    ELSE 0.0 END) - CAST(f2 AS DOUBLE)) / CAST(f2 AS DOUBLE) AS rel_err
        |FROM a""".stripMargin,
    // DuckDB's grouping(a, b) bitmask matches Spark's grouping_id()
    // (first cube column = MSB — probed, not assumed)
    "q193_cube_rollup" ->
      """SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
        |  CAST(grouping(c.c_mktsegment, o.o_orderpriority) AS BIGINT) AS gid,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |GROUP BY CUBE (c.c_mktsegment, o.o_orderpriority)
        |ORDER BY gid, segment, priority""".stripMargin,
    // three rungs of the same class-size screen; only the class key
    // coarsens
    "q194_generalization_ladder" ->
      """WITH c AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_acctbal FROM customer),
        |r1 AS (SELECT concat_ws(':', nation,
        |         CAST(floor(c_acctbal / 100) AS BIGINT)) AS cls,
        |         COUNT(*) AS n FROM c GROUP BY 1),
        |r2 AS (SELECT concat_ws(':', nation,
        |         CAST(floor(c_acctbal / 1000) AS BIGINT)) AS cls,
        |         COUNT(*) AS n FROM c GROUP BY 1),
        |r3 AS (SELECT CAST(nation AS VARCHAR) AS cls, COUNT(*) AS n
        |       FROM c GROUP BY 1),
        |s AS (
        |  SELECT 'w100' AS rung, CAST(COUNT(*) AS BIGINT) AS n_classes,
        |    CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_at_risk,
        |    CAST(COALESCE(SUM(CASE WHEN n < 5 THEN n END), 0) AS BIGINT)
        |      AS rows_suppressed,
        |    CAST(COALESCE(SUM(CASE WHEN n < 5 THEN n END), 0) AS DOUBLE)
        |      / CAST(SUM(n) AS DOUBLE) AS suppression_rate
        |  FROM r1
        |  UNION ALL
        |  SELECT 'w1000', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN n < 5 THEN n END), 0) AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN n < 5 THEN n END), 0) AS DOUBLE)
        |      / CAST(SUM(n) AS DOUBLE)
        |  FROM r2
        |  UNION ALL
        |  SELECT 'nation_only', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN n < 5 THEN n END), 0) AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN n < 5 THEN n END), 0) AS DOUBLE)
        |      / CAST(SUM(n) AS DOUBLE)
        |  FROM r3)
        |SELECT * FROM s ORDER BY rung""".stripMargin,
    // positional bigrams ≡ the Spark lead() pairs; threshold compare on
    // one exact-count double division — no transcendentals anywhere
    "q195_rare_transitions" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |inst AS (
        |  SELECT doc_id, w[i] AS a, w[i + 1] AS b
        |  FROM d, unnest(generate_series(1, len(w) - 1)) AS u(i)
        |  WHERE len(w) >= 2),
        |cab AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab
        |        FROM inst GROUP BY 1, 2),
        |ca AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS c_a FROM inst GROUP BY 1),
        |m AS (SELECT cab.a, cab.b,
        |        CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE) AS p
        |      FROM cab JOIN ca USING (a))
        |SELECT i.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(CASE WHEN m.p < 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        |  CAST(SUM(CASE WHEN m.p < 0.01 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS rare_frac,
        |  (CAST(SUM(CASE WHEN m.p < 0.01 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) > 0.3) AS suspicious
        |FROM inst i JOIN m ON m.a = i.a AND m.b = i.b
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // one per-user window pass; churn attributed to the first silent
    // week, bounded by the observed range
    "q196_growth_accounting" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id AS k,
        |    (epoch_ns(ts) // 86400000000000) // 7 AS w
        |  FROM events),
        |mx AS (SELECT MAX(w) AS mw FROM act),
        |lane AS (
        |  SELECT k, w,
        |    MIN(w) OVER (PARTITION BY k) AS first_w,
        |    LAG(w) OVER (PARTITION BY k ORDER BY w) AS prev_w,
        |    LEAD(w) OVER (PARTITION BY k ORDER BY w) AS next_w
        |  FROM act),
        |states AS (
        |  SELECT w AS period, CAST(COUNT(*) AS BIGINT) AS n_active,
        |    CAST(SUM(CASE WHEN w = first_w THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |    CAST(SUM(CASE WHEN prev_w = w - 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_retained,
        |    CAST(SUM(CASE WHEN prev_w IS NOT NULL AND prev_w < w - 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |  FROM lane GROUP BY 1),
        |churn AS (
        |  SELECT w + 1 AS period, CAST(COUNT(*) AS BIGINT) AS n_churned
        |  FROM lane, mx
        |  WHERE (next_w IS NULL OR next_w > w + 1) AND w + 1 <= mw
        |  GROUP BY 1)
        |SELECT coalesce(s.period, c.period) AS period,
        |  coalesce(n_active, 0) AS n_active, coalesce(n_new, 0) AS n_new,
        |  coalesce(n_retained, 0) AS n_retained,
        |  coalesce(n_resurrected, 0) AS n_resurrected,
        |  coalesce(n_churned, 0) AS n_churned
        |FROM states s FULL OUTER JOIN churn c ON c.period = s.period
        |ORDER BY period""".stripMargin,
    // q125's contribution-explode for the WAU side; the dau join bounds
    // the series to observed days
    "q197_stickiness" ->
      """WITH p AS (
        |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS d, user_id
        |  FROM events),
        |dau AS (SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS dau
        |        FROM p GROUP BY 1),
        |wau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS wau FROM (
        |          SELECT DISTINCT d + x AS day, user_id
        |          FROM p, unnest(generate_series(0, 6)) AS g(x)) t
        |        GROUP BY 1)
        |SELECT dau.day, dau.dau, wau.wau,
        |  CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,
    // expected/chi2 computed once in CTEs; identical association both
    // sides; 3.8415 = the 1-dof 5% critical value
    "q198_srm_check" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |arms AS (SELECT user_id % 2 AS grp, COUNT(*) AS n FROM u GROUP BY 1),
        |a AS (SELECT
        |  CAST(SUM(CASE WHEN grp = 0 THEN n ELSE 0 END) AS BIGINT) AS n_0,
        |  CAST(SUM(CASE WHEN grp = 1 THEN n ELSE 0 END) AS BIGINT) AS n_1
        |  FROM arms),
        |e AS (SELECT n_0, n_1,
        |        CAST(n_0 + n_1 AS DOUBLE) / 2.0 AS expected FROM a),
        |c AS (SELECT n_0, n_1, expected,
        |        (CAST(n_0 AS DOUBLE) - expected) * (CAST(n_0 AS DOUBLE) - expected)
        |          / expected
        |        + (CAST(n_1 AS DOUBLE) - expected) * (CAST(n_1 AS DOUBLE) - expected)
        |          / expected AS chi2
        |      FROM e)
        |SELECT n_0, n_1, expected, chi2,
        |  (chi2 > 3.841458820694124) AS srm_flag
        |FROM c""".stripMargin,
    // 9 blocks generated from the SAME layout/probe spec the Spark side
    // uses (q185's one-spec-two-faces discipline); each block is q108's
    // zone-map arithmetic
    "q201_index_advisor" -> {
      val blocks = for {
        (lname, zsql) <- advisorLayouts
        (pname, statSql, loSql, hiSql) <- advisorProbes
      } yield
        s"""SELECT '$lname' AS layout, '$pname' AS probe,
           |  CAST(COUNT(*) AS BIGINT) AS zones_total,
           |  CAST(COALESCE(SUM(CASE WHEN mx >= $loSql AND mn <= $hiSql
           |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS zones_scanned,
           |  CAST(COALESCE(SUM(CASE WHEN mx >= $loSql AND mn <= $hiSql
           |    THEN n END), 0) AS BIGINT) AS rows_scanned,
           |  CAST(COALESCE(SUM(m), 0) AS BIGINT) AS rows_matched,
           |  CAST(COALESCE(SUM(CASE WHEN mx >= $loSql AND mn <= $hiSql
           |    THEN n END), 0) AS DOUBLE)
           |    / CAST(COALESCE(SUM(n), 0) AS DOUBLE) AS frac_scanned
           |FROM (
           |  SELECT $zsql AS z, COUNT(*) AS n,
           |    MIN($statSql) AS mn, MAX($statSql) AS mx,
           |    SUM(CASE WHEN $statSql BETWEEN $loSql AND $hiSql
           |      THEN 1 ELSE 0 END) AS m
           |  FROM lineitem
           |  WHERE $zsql IS NOT NULL AND $statSql IS NOT NULL
           |  GROUP BY 1) zz""".stripMargin
      blocks.mkString("", "\nUNION ALL\n", "\nORDER BY layout, probe")
    },
    // exact decimal/HUGEINT moments; the slope/intercept/forecast chain
    // mirrored operation-for-operation
    "q202_token_forecast" ->
      """WITH daily AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS x,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |        CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
        |        CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |        CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |        MAX(x) AS x_max
        |      FROM daily),
        |fit AS (SELECT
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
        |    sy, sx, n, x_max FROM m),
        |fit2 AS (SELECT slope,
        |    (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS intercept,
        |    x_max FROM fit)
        |SELECT CAST(x_max + g.d AS BIGINT) AS day,
        |  intercept + slope * CAST(x_max + g.d AS DOUBLE) AS forecast_events,
        |  slope, intercept
        |FROM fit2, generate_series(1, 7) AS g(d)
        |ORDER BY day""".stripMargin,
    // per-point best/second-best centroid in the double dot-product
    // domain; medians via quantile_cont (the q106 kernel parity)
    "q203_cluster_silhouette" ->
      """WITH emb2 AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |e AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb2),
        |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
        |            v AS cv, nrm AS cn
        |          FROM e ORDER BY vec_id LIMIT 16),
        |asg AS (
        |  SELECT p.vec_id AS id, c.cid,
        |    1.0 - list_dot_product(p.v, c.cv) / (p.nrm * c.cn) AS dist,
        |    row_number() OVER (PARTITION BY p.vec_id
        |      ORDER BY list_dot_product(p.v, c.cv) / (p.nrm * c.cn) DESC,
        |               c.cid) AS r
        |  FROM e p, cents c),
        |pp AS (
        |  SELECT a1.id, CAST(a1.cid AS INTEGER) AS cluster,
        |    a1.dist AS intra, a2.dist AS other, a2.dist - a1.dist AS margin
        |  FROM asg a1 JOIN asg a2 ON a2.id = a1.id AND a2.r = 2
        |  WHERE a1.r = 1)
        |SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n,
        |  quantile_cont(intra, 0.5) AS med_intra,
        |  quantile_cont(other, 0.5) AS med_other,
        |  quantile_cont(margin, 0.5) AS med_margin,
        |  (quantile_cont(margin, 0.5) > 0.0) AS healthy
        |FROM pp GROUP BY 1 ORDER BY cluster""".stripMargin,
    // one global running max (fine at oracle scale), candidates unnested
    "q204_watermark_planner" ->
      """WITH b AS (SELECT event_id AS o, CAST(epoch_us(ts) AS BIGINT) AS t
        |           FROM events),
        |rm AS (SELECT o, t,
        |         MAX(t) OVER (ORDER BY o ROWS UNBOUNDED PRECEDING) AS runmax
        |       FROM b),
        |l AS (SELECT runmax - t AS late FROM rm),
        |c AS (SELECT unnest([60000000, 300000000, 1800000000]) AS watermark)
        |SELECT CAST(c.watermark AS BIGINT) AS watermark,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN l.late > c.watermark THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dropped,
        |  CAST(SUM(CASE WHEN l.late > c.watermark THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS drop_frac
        |FROM l, c GROUP BY 1 ORDER BY watermark""".stripMargin,
    // exact-cents cell means, MAX-pivot (one row per cell), mirrored
    // subtraction association
    "q205_did_readout" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |p AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS pivot FROM ev),
        |cells AS (
        |  SELECT user_id % 2 AS arm,
        |    CASE WHEN day >= p.pivot THEN 1 ELSE 0 END AS period,
        |    CAST(SUM(cents) AS HUGEINT) AS s, COUNT(*) AS n
        |  FROM ev, p GROUP BY 1, 2),
        |m AS (SELECT arm, period,
        |        CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean
        |      FROM cells),
        |piv AS (SELECT
        |  MAX(CASE WHEN arm = 0 AND period = 0 THEN mean END) AS m00,
        |  MAX(CASE WHEN arm = 0 AND period = 1 THEN mean END) AS m01,
        |  MAX(CASE WHEN arm = 1 AND period = 0 THEN mean END) AS m10,
        |  MAX(CASE WHEN arm = 1 AND period = 1 THEN mean END) AS m11
        |  FROM m)
        |SELECT m00, m01, m10, m11,
        |  (m11 - m10) - (m01 - m00) AS did
        |FROM piv""".stripMargin,
    // q202's fit + R-7 residual quantiles (the exact-quantile kernel
    // parity); band edges are one addition each
    "q207_forecast_bands" ->
      """WITH daily AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS x,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |        CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
        |        CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |        CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |        MAX(x) AS x_max
        |      FROM daily),
        |fit AS (SELECT
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
        |    sy, sx, n, x_max FROM m),
        |fit2 AS (SELECT slope,
        |    (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS intercept,
        |    x_max FROM fit),
        |res AS (SELECT CAST(y AS DOUBLE)
        |          - (intercept + slope * CAST(x AS DOUBLE)) AS r
        |        FROM daily, fit2),
        |b AS (SELECT quantile_cont(r, 0.1) AS q10,
        |        quantile_cont(r, 0.9) AS q90 FROM res)
        |SELECT CAST(x_max + g.d AS BIGINT) AS day,
        |  intercept + slope * CAST(x_max + g.d AS DOUBLE) AS forecast_events,
        |  (intercept + slope * CAST(x_max + g.d AS DOUBLE)) + q10 AS lo,
        |  (intercept + slope * CAST(x_max + g.d AS DOUBLE)) + q90 AS hi
        |FROM fit2, b, generate_series(1, 7) AS g(d)
        |ORDER BY day""".stripMargin,
    // brute force every (length, start) token gram (docs are <= 100 tokens,
    // so sum len^2/2 is small at oracle scale); the Spark side never
    // enumerates grams - full-depth suffix ranks + adjacent cross-doc LCP
    "q208_max_dup_substring" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, l.l AS len,
        |    array_to_string(w[s.s : s.s + l.l - 1], ' ') AS gram
        |  FROM d,
        |    unnest(generate_series(1, len(w))) AS l(l),
        |    unnest(generate_series(1, len(w) - l.l + 1)) AS s(s)),
        |dup AS (
        |  SELECT len, gram FROM g
        |  GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= 2),
        |best AS (
        |  SELECT g.doc_id, CAST(max(g.len) AS BIGINT) AS m
        |  FROM g JOIN dup USING (len, gram) GROUP BY 1)
        |SELECT d2.doc_id,
        |  CAST(coalesce(b.m, 0) AS BIGINT) AS max_dup_substring_tokens
        |FROM documents d2 LEFT JOIN best b ON d2.doc_id = b.doc_id
        |ORDER BY d2.doc_id""".stripMargin,
    // q180's residual chain + one raw-MAD pass; strength clipped at 0
    "q206_seasonal_strength" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(COUNT(*) AS DOUBLE) AS n
        |  FROM events GROUP BY 1, 2),
        |m1 AS (SELECT event_type, day % 7 AS dow,
        |         quantile_cont(n, 0.5) AS expected
        |       FROM daily GROUP BY 1, 2),
        |r AS (SELECT d.event_type, d.day, d.n,
        |        d.n - m1.expected AS residual
        |      FROM daily d JOIN m1
        |        ON m1.event_type = d.event_type AND m1.dow = d.day % 7),
        |m2 AS (SELECT event_type, quantile_cont(residual, 0.5) AS med_resid
        |       FROM r GROUP BY 1),
        |mres AS (SELECT r.event_type,
        |           quantile_cont(ABS(r.residual - m2.med_resid), 0.5) AS mad_resid
        |         FROM r JOIN m2 USING (event_type) GROUP BY 1),
        |mr AS (SELECT event_type, quantile_cont(n, 0.5) AS med_raw
        |       FROM daily GROUP BY 1),
        |mraw AS (SELECT d.event_type,
        |           quantile_cont(ABS(d.n - mr.med_raw), 0.5) AS mad_raw
        |         FROM daily d JOIN mr USING (event_type) GROUP BY 1)
        |SELECT mraw.event_type, mraw.mad_raw, mres.mad_resid,
        |  CASE WHEN mraw.mad_raw > 0.0 THEN
        |    greatest(0.0, 1.0 - mres.mad_resid / mraw.mad_raw)
        |  END AS strength
        |FROM mraw JOIN mres USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // q126's quasi discipline with segment as the SENSITIVE attribute
    "q179_l_diversity" ->
      """WITH q AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |    CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_bucket,
        |    c_mktsegment AS segment
        |  FROM customer),
        |sc AS (SELECT nation, bal_bucket, segment, COUNT(*) AS c
        |       FROM q GROUP BY 1, 2, 3)
        |SELECT nation, bal_bucket,
        |  CAST(SUM(c) AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS l_distinct,
        |  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_share,
        |  (COUNT(*) < 2) AS at_risk
        |FROM sc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Gonzalez k-center unrolled as chained CTEs: selection argmax in the
    // DIST domain (least of 1-cos), assignment in the COS domain (q17's
    // rule) — the exact domain split Coreset.kCenterAssign pins
    "q172_kcenter_coreset" ->
      s"""WITH ${kcenterSqlCte("")},
         |asg AS (
         |  SELECT p.vec_id AS id, c.cid, c.rnk,
         |         1.0 - list_dot_product(p.v, c.cv) / (p.nrm * c.cn) AS dist,
         |         row_number() OVER (PARTITION BY p.vec_id
         |           ORDER BY list_dot_product(p.v, c.cv) / (p.nrm * c.cn) DESC,
         |                    c.rnk) AS r
         |  FROM e p, cents c)
         |SELECT id, cid AS center_id, CAST(rnk AS INTEGER) AS center_rank, dist
         |FROM asg WHERE r = 1 ORDER BY id""".stripMargin,
    // the store's centers (old rows only) + radius, probed by the batch:
    // both assignments replay the same double-path cosine chain
    "q184_coreset_drift" ->
      s"""WITH ${kcenterSqlCte("WHERE vec_id % 10 <> 0")},
         |asgo AS (
         |  SELECT p.vec_id AS id, c.cid, c.rnk,
         |         1.0 - list_dot_product(p.v, c.cv) / (p.nrm * c.cn) AS dist,
         |         row_number() OVER (PARTITION BY p.vec_id
         |           ORDER BY list_dot_product(p.v, c.cv) / (p.nrm * c.cn) DESC,
         |                    c.rnk) AS r
         |  FROM e p, cents c),
         |olda AS (SELECT id, cid, rnk, dist FROM asgo WHERE r = 1),
         |rad AS (SELECT rnk, MAX(cid) AS center_id, MAX(dist) AS radius
         |        FROM olda GROUP BY 1),
         |emb2b AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings WHERE vec_id % 10 = 0),
         |eb AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb2b),
         |asgb AS (
         |  SELECT p.vec_id AS id, c.rnk,
         |         1.0 - list_dot_product(p.v, c.cv) / (p.nrm * c.cn) AS dist,
         |         row_number() OVER (PARTITION BY p.vec_id
         |           ORDER BY list_dot_product(p.v, c.cv) / (p.nrm * c.cn) DESC,
         |                    c.rnk) AS r
         |  FROM eb p, cents c),
         |newa AS (SELECT id, rnk, dist FROM asgb WHERE r = 1),
         |st AS (
         |  SELECT n.rnk, CAST(COUNT(*) AS BIGINT) AS n_new,
         |    MAX(n.dist) AS max_dist_new,
         |    CAST(SUM(CASE WHEN n.dist > rad.radius THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_beyond
         |  FROM newa n JOIN rad ON rad.rnk = n.rnk GROUP BY 1)
         |SELECT CAST(rad.rnk AS INTEGER) AS center_rank, rad.center_id,
         |  rad.radius, coalesce(st.n_new, 0) AS n_new, st.max_dist_new,
         |  coalesce(st.n_beyond, 0) AS n_beyond
         |FROM rad LEFT JOIN st ON st.rnk = rad.rnk ORDER BY center_rank""".stripMargin,
    // full-recompute oracle: parity PROVES the incremental count-state
    // merge equals a rescan of all history (disjoint count sums)
    "q183_profile_store" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |tc AS (SELECT user_id, event_type, COUNT(*) AS c FROM ev GROUP BY 1, 2),
        |fav AS (SELECT user_id, event_type AS fav_type FROM (
        |          SELECT user_id, event_type,
        |            row_number() OVER (PARTITION BY user_id
        |              ORDER BY c DESC, event_type ASC) AS r
        |          FROM tc) t WHERE r = 1)
        |SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  MAX(e.cents) AS max_cents, MAX(e.day) AS last_day, f.fav_type
        |FROM ev e JOIN fav f USING (user_id)
        |GROUP BY 1, 5 ORDER BY user_id""".stripMargin,
    // relational minimax isotonic fit: interval means on exact BIGINT
    // prefix sums; min/max over doubles are rounding-monotone, so the fit
    // is bit-identical to Spark's
    "q173_isotonic_calibration" ->
      """WITH emb2 AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    label
        |  FROM embeddings),
        |e AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, label
        |      FROM emb2),
        |a AS (
        |  SELECT vec_id AS aid, v AS avec, nrm AS anrm, label AS albl
        |  FROM e ORDER BY vec_id LIMIT 1),
        |s AS (
        |  SELECT least(31, greatest(0, CAST(floor(
        |           (list_dot_product(e.v, a.avec) / (e.nrm * a.anrm) - (-1.0))
        |             / 2.0 * 32) AS INTEGER))) AS bin,
        |         (e.label = a.albl) AS y
        |  FROM e, a WHERE e.vec_id <> a.aid),
        |b AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |      FROM s GROUP BY 1),
        |seq AS (SELECT *, CAST(row_number() OVER (ORDER BY bin) - 1 AS INTEGER) AS i
        |        FROM b),
        |pre AS (SELECT *,
        |          CAST(sum(n) OVER (ORDER BY i) AS BIGINT) AS cn,
        |          CAST(sum(pos) OVER (ORDER BY i) AS BIGINT) AS cp
        |        FROM seq),
        |iv AS (
        |  SELECT s2.i AS j, e2.i AS k,
        |         CAST(e2.cp - (s2.cp - s2.pos) AS DOUBLE)
        |           / CAST(e2.cn - (s2.cn - s2.n) AS DOUBLE) AS avg
        |  FROM pre s2 JOIN pre e2 ON s2.i <= e2.i),
        |inn AS (
        |  SELECT p.i, iv.j, min(iv.avg) AS mn
        |  FROM pre p JOIN iv ON iv.j <= p.i AND iv.k >= p.i
        |  GROUP BY 1, 2),
        |fit AS (SELECT i, max(mn) AS iso_rate FROM inn GROUP BY 1)
        |SELECT CAST(pre.bin AS INTEGER) AS bin, pre.n, pre.pos,
        |  CAST(pre.pos AS DOUBLE) / CAST(pre.n AS DOUBLE) AS raw_rate,
        |  fit.iso_rate
        |FROM pre JOIN fit USING (i) ORDER BY bin""".stripMargin,
    // q113's brute-force differential, containment flavor: the oracle
    // shares only the C(A,B) = |A∩B|/|A| definition with the Spark side
    "q127_containment" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id,
        |      CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
        |           ELSE w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] END AS s
        |    FROM d, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS u(i)) t),
        |counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(count(*) AS BIGINT) AS m
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT ia AS id_a, ib AS id_b,
        |  CAST(m AS DOUBLE) / ca.n AS containment
        |FROM inter
        |JOIN counts ca ON ca.doc_id = ia
        |JOIN counts cb ON cb.doc_id = ib
        |WHERE (ca.n < cb.n OR (ca.n = cb.n AND ia < ib))
        |  AND ca.n >= 10
        |  AND CAST(m AS DOUBLE) / ca.n >= CAST(0.9 AS DOUBLE)
        |ORDER BY id_a, id_b""".stripMargin,
    // class-grain audit: one aggregate on the quasi projection; floor of
    // an exact double division buckets identically in both engines
    "q126_k_anonymity" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |  c_mktsegment AS segment,
        |  CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  (COUNT(*) < 5) AS at_risk,
        |  CAST(1.0 AS DOUBLE) / COUNT(*) AS risk
        |FROM customer
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // contribution-explode rolling distinct: each distinct (day, user)
    // pair is visible from 7 window-end days, clipped to observed range
    "q125_sliding_distinct" -> slidingDistinctOracleSql,
    // q125's one-shot series IS q129's oracle — the incremental update
    // must be indistinguishable from it (the q112 argument)
    "q129_sliding_distinct_inc" -> slidingDistinctOracleSql,
    // q117's lift arithmetic over the windowed unordered pair stream
    "q121_skipgram" ->
      """WITH d AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |uni AS (SELECT unnest(t) AS tok FROM d),
        |pg AS (
        |  SELECT least(t[i], t[i+j]) AS x, greatest(t[i], t[i+j]) AS y
        |  FROM d, unnest(generate_series(1, len(t))) AS u(i),
        |       unnest(generate_series(1, 3)) AS v(j)
        |  WHERE len(t) >= 2 AND i + j <= len(t)),
        |uc AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok),
        |bc AS (SELECT x, y, COUNT(*) AS c_xy FROM pg GROUP BY x, y
        |       HAVING COUNT(*) >= 5),
        |n AS (SELECT COUNT(*) AS nn FROM uni),
        |m AS (SELECT COUNT(*) AS mm FROM pg)
        |SELECT bc.x, bc.y, bc.c_xy,
        |  CAST(bc.c_xy AS DOUBLE) * n.nn * n.nn /
        |    (CAST(m.mm AS DOUBLE) * ux.c * uy.c) AS lift
        |FROM bc
        |JOIN uc ux ON ux.tok = bc.x
        |JOIN uc uy ON uy.tok = bc.y
        |CROSS JOIN n CROSS JOIN m
        |ORDER BY lift DESC, bc.x, bc.y LIMIT 50""".stripMargin,
    // the same fixed-point recurrence as the Scala loop, unrolled: all
    // arithmetic is BIGINT floor division, so 10 iterations replay exactly
    "q120_pagerank" -> {
      val iters = (1 to 10).map { k =>
        val prev = if (k == 1) "s0" else s"s${k - 1}"
        s"""s$k AS (SELECT d.node, d.outdeg,
           |  (15000000000000 // (100 * nn.n)) + (85 * COALESCE(c.s, 0)) // 100
           |    AS score
           |  FROM deg d CROSS JOIN nn
           |  LEFT JOIN (SELECT e.dst, CAST(SUM(s.score // s.outdeg) AS BIGINT) AS s
           |             FROM ed e JOIN $prev s ON s.node = e.src GROUP BY e.dst) c
           |  ON c.dst = d.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |pairs AS (
         |  SELECT a.p AS pa, b.p AS pb FROM op a JOIN op b
         |  ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING count(*) >= 2),
         |ed AS (SELECT pa AS src, pb AS dst FROM pairs
         |       UNION ALL SELECT pb, pa FROM pairs),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
         |        FROM ed GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM deg),
         |s0 AS (SELECT node, outdeg, 1000000000000 // nn.n AS score
         |       FROM deg CROSS JOIN nn),
         |$iters
         |SELECT node AS part, score FROM s10
         |ORDER BY score DESC, part LIMIT 100""".stripMargin
    },
    // q56's BM25 rank chain + q16's cosine rank chain (queries 1-3, k=10
    // both), fused with the fixed-order two-term RRF sum — rank-only, so
    // the float-vs-double cosine difference never reaches the compare
    "q119_hybrid_rrf" -> {
      val vals = bm25Queries
        .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }.mkString(", ")
      val inList = bm25Queries.flatMap(_._2).distinct.map(t => s"'$t'").mkString(", ")
      val qidList = bm25Queries.map(_._1).mkString(", ")
      s"""WITH q(query_id, term) AS (VALUES $vals),
         |base AS (
         |  SELECT id, CAST(len(tk) AS DOUBLE) AS dl, unnest(tk) AS term
         |  FROM (SELECT doc_id AS id,
         |          string_split_regex(trim(lower(text)), '\\s+') AS tk
         |        FROM documents)),
         |tfq AS (
         |  SELECT id, term, CAST(COUNT(*) AS DOUBLE) AS tf, ANY_VALUE(dl) AS dl
         |  FROM base WHERE term IN ($inList) GROUP BY 1, 2),
         |dfc AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tfq GROUP BY 1),
         |stats AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         |    AVG(CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE))
         |      AS avgdl
         |  FROM documents),
         |scored AS (
         |  SELECT q.query_id, tfq.id,
         |    CAST(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) * tfq.tf * 2.2
         |      / (tfq.tf + 1.2 * (1.0 - 0.75 + 0.75 * tfq.dl / s.avgdl))
         |      AS DECIMAL(38,12)) AS sc
         |  FROM tfq JOIN q ON q.term = tfq.term
         |  JOIN dfc d ON d.term = tfq.term, stats s),
         |agg AS (SELECT query_id, id, SUM(sc) AS score FROM scored GROUP BY 1, 2),
         |bm AS (
         |  SELECT query_id, doc_id, r FROM (
         |    SELECT query_id, id AS doc_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS r
         |    FROM agg) t WHERE r <= 10),
         |qe AS (SELECT vec_id AS query_id, embedding AS qv
         |       FROM embeddings WHERE vec_id IN ($qidList)),
         |cpairs AS (
         |  SELECT qe.query_id, c.vec_id AS doc_id,
         |         list_cosine_similarity(qe.qv, c.embedding) AS cos
         |  FROM qe JOIN embeddings c ON c.vec_id <> qe.query_id),
         |cs AS (
         |  SELECT query_id, doc_id, r FROM (
         |    SELECT query_id, doc_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS r
         |    FROM cpairs) t WHERE r <= 10),
         |f AS (
         |  SELECT COALESCE(bm.query_id, cs.query_id) AS query_id,
         |         COALESCE(bm.doc_id, cs.doc_id) AS doc_id,
         |         COALESCE(1.0 / (60 + bm.r), 0.0) + COALESCE(1.0 / (60 + cs.r), 0.0)
         |           AS rrf_score
         |  FROM bm FULL OUTER JOIN cs
         |    ON bm.query_id = cs.query_id AND bm.doc_id = cs.doc_id)
         |SELECT query_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank,
         |  doc_id, rrf_score
         |FROM f
         |QUALIFY rank <= 10
         |ORDER BY query_id, rank""".stripMargin
    },
    "q118_group_split" -> {
      val b = graft.operators.Splits.bucketSql("source")
      s"""WITH a AS (
         |  SELECT source,
         |    CASE WHEN $b < 800000 THEN 'train'
         |         WHEN $b < 900000 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents),
         |s AS (SELECT source, split, COUNT(*) AS rws FROM a GROUP BY 1, 2),
         |g AS (SELECT split, COUNT(*) AS n_groups,
         |      CAST(SUM(rws) AS BIGINT) AS n_rows
         |      FROM s GROUP BY split),
         |t AS (SELECT SUM(n_rows) AS total FROM g)
         |SELECT g.split, g.n_groups, g.n_rows,
         |  CAST(CASE g.split WHEN 'train' THEN 800000
         |       WHEN 'val' THEN 100000 ELSE 100000 END AS BIGINT)
         |    AS rows_ppm_target,
         |  CAST(FLOOR(g.n_rows * 1000000 / t.total) AS BIGINT)
         |    AS rows_ppm_achieved
         |FROM g CROSS JOIN t ORDER BY g.split""".stripMargin
    },
    // lift arithmetic mirrors the Spark column order exactly:
    // ((c_xy * N) * N) / ((M * c_x) * c_y), all IEEE-correctly-rounded
    "q117_collocations" ->
      """WITH d AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |uni AS (SELECT unnest(t) AS tok FROM d),
        |bg AS (
        |  SELECT t[i] AS x, t[i+1] AS y
        |  FROM d, unnest(generate_series(1, len(t) - 1)) AS u(i)
        |  WHERE len(t) >= 2),
        |uc AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok),
        |bc AS (SELECT x, y, COUNT(*) AS c_xy FROM bg GROUP BY x, y
        |       HAVING COUNT(*) >= 3),
        |n AS (SELECT COUNT(*) AS nn FROM uni),
        |m AS (SELECT COUNT(*) AS mm FROM bg)
        |SELECT bc.x, bc.y, bc.c_xy,
        |  CAST(bc.c_xy AS DOUBLE) * n.nn * n.nn /
        |    (CAST(m.mm AS DOUBLE) * ux.c * uy.c) AS lift
        |FROM bc
        |JOIN uc ux ON ux.tok = bc.x
        |JOIN uc uy ON uy.tok = bc.y
        |CROSS JOIN n CROSS JOIN m
        |ORDER BY lift DESC, bc.x, bc.y LIMIT 50""".stripMargin,
    // q85's range chain + the cut: original-case tokens anti-filtered by
    // position against the ranges, rejoined with single spaces
    "q87_cut_spans" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t,
        |         string_split_regex(trim(text), '\s+') AS torig
        |  FROM documents),
        |win AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS sp, array_to_string(t[i:i+7], ' ') AS s
        |  FROM d, unnest(generate_series(1, len(t) - 7)) AS u(i)
        |  WHERE len(t) >= 8),
        |duph AS (
        |  SELECT s FROM (SELECT s, doc_id FROM win GROUP BY 1, 2)
        |  GROUP BY s HAVING COUNT(*) >= 2),
        |dup AS (SELECT doc_id, sp FROM win WHERE s IN (SELECT s FROM duph)),
        |isl AS (
        |  SELECT doc_id, sp,
        |    SUM(CASE WHEN psp IS NULL OR sp - psp > 8 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY sp) AS island
        |  FROM (SELECT doc_id, sp,
        |          LAG(sp) OVER (PARTITION BY doc_id ORDER BY sp) AS psp
        |        FROM dup)),
        |rng AS (
        |  SELECT doc_id, MIN(sp) AS a, MAX(sp) + 7 AS b
        |  FROM isl GROUP BY doc_id, island),
        |tokpos AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS p, torig[i] AS tok
        |  FROM d, unnest(generate_series(1, len(torig))) AS u(i)),
        |kept AS (
        |  SELECT tp.doc_id, tp.p, tp.tok FROM tokpos tp
        |  WHERE NOT EXISTS (SELECT 1 FROM rng r
        |                    WHERE r.doc_id = tp.doc_id AND tp.p BETWEEN r.a AND r.b))
        |SELECT d2.doc_id, COALESCE(k.text, '') AS text,
        |  CAST(d2.n - COALESCE(k.n, 0) AS BIGINT) AS n_cut
        |FROM (SELECT doc_id, len(torig) AS n FROM d) d2
        |LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text,
        |             COUNT(*) AS n FROM kept GROUP BY doc_id) k USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // q89: every ratio is exact-int / exact-int divided once; literal
    // counts via the length/replace trick (replace-with-empty, so the
    // divisor is len(sub)) — bit-identical across engines
    "q89_gopher_rules" -> s"$gopherRulesSql\nORDER BY doc_id",
    // q88: character indexing on VARCHAR replays Spark's split-on-"" at
    // the word grain; LIMIT ties broken by (n desc, a, b) total order
    "q88_bpe_pairs" ->
      """WITH w AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        |        FROM documents)
        |  WHERE length(word) > 0 GROUP BY word),
        |p AS (
        |  SELECT word[i] AS a, word[i+1] AS b, freq
        |  FROM w, unnest(generate_series(1, length(word) - 1)) AS u(i))
        |SELECT a, b, CAST(SUM(freq) AS BIGINT) AS n
        |FROM p GROUP BY a, b ORDER BY n DESC, a, b LIMIT 20""".stripMargin,
    "q69_keywords" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
        |d AS (SELECT doc_id, term, tf,
        |        CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
        |      FROM tf),
        |r AS (SELECT doc_id, term, tf, df, CAST(tf AS DOUBLE) / df AS score,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |          ORDER BY CAST(tf AS DOUBLE) / df DESC, term) AS BIGINT) AS rank
        |      FROM d)
        |SELECT doc_id, rank, term, tf, df, score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q70_epoch_shards" -> {
      val k = graft.functions.PortableHash.md5Hash60Sql("'3:' || CAST(doc_id AS VARCHAR)")
      s"""WITH a AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS t,
         |    $k AS k
         |  FROM documents),
         |s AS (SELECT doc_id, t, k, CAST(k % 8 AS INTEGER) AS shard FROM a),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id) AS rn
         |      FROM s)
         |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(t) AS BIGINT) AS n_tokens,
         |  CAST(MIN(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS first_doc
         |FROM r GROUP BY shard ORDER BY shard""".stripMargin
    },
    "q71_weighted_sample" -> {
      val k = graft.functions.PortableHash.md5Hash60Sql("doc_id")
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS w,
         |    ($k % 1000000000) AS h
         |  FROM documents),
         |p AS (SELECT doc_id, w, CAST(h // w AS BIGINT) AS priority FROM d)
         |SELECT doc_id, w, priority FROM p
         |ORDER BY priority, doc_id LIMIT 50""".stripMargin
    },
    // the q58 vocabulary CTE verbatim, then an order-preserving encode
    "q72_token_ids" ->
      """WITH t0 AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |c AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM t0
        |  GROUP BY term HAVING COUNT(*) >= 5
        |  ORDER BY n DESC, term LIMIT 100),
        |v AS (
        |  SELECT term,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS BIGINT) AS vocab_id
        |  FROM c),
        |toks AS (
        |  SELECT doc_id, i AS pos, l[i] AS term
        |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS l
        |        FROM documents),
        |    unnest(generate_series(1, len(l))) AS u(i)),
        |j AS (
        |  SELECT toks.doc_id, toks.pos, COALESCE(v.vocab_id, 0) AS vid
        |  FROM toks LEFT JOIN v USING (term))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN vid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  string_agg(CAST(vid AS VARCHAR), ',' ORDER BY pos) AS ids_csv
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q73_length_batches" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS len
        |  FROM documents),
        |r AS (SELECT doc_id, len,
        |        ROW_NUMBER() OVER (ORDER BY len DESC, doc_id) - 1 AS rn
        |      FROM d),
        |b AS (SELECT doc_id, len, CAST(rn // 32 AS BIGINT) AS batch FROM r)
        |SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(MAX(len) AS BIGINT) AS max_len,
        |  CAST(SUM(len) AS BIGINT) AS sum_len,
        |  CAST(COUNT(*) * MAX(len) - SUM(len) AS BIGINT) AS pad_waste
        |FROM b GROUP BY batch ORDER BY batch""".stripMargin,
    "q74_dup_spans_inc" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |win AS (
        |  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS s
        |  FROM d, unnest(generate_series(1, len(t) - 7)) AS u(i)
        |  WHERE len(t) >= 8),
        |nw AS (SELECT * FROM win WHERE doc_id % 7 = 0),
        |store AS (SELECT DISTINCT s FROM win WHERE doc_id % 7 <> 0),
        |pd AS (SELECT s, doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM nw GROUP BY 1, 2),
        |nd AS (
        |  SELECT pd.s, pd.doc_id, pd.c,
        |    COUNT(*) OVER (PARTITION BY pd.s) AS ndocs,
        |    store.s IS NOT NULL AS in_store
        |  FROM pd LEFT JOIN store ON pd.s = store.s)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_windows,
        |  CAST(SUM(CASE WHEN ndocs >= 2 OR in_store THEN c ELSE 0 END) AS BIGINT)
        |    AS dup_windows,
        |  CAST(SUM(CASE WHEN ndocs >= 2 OR in_store THEN c ELSE 0 END) AS DOUBLE)
        |    / SUM(c) AS dup_frac
        |FROM nd GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // naive non-equi overlap join — the binned plan must reproduce it
    "q75_interval_overlap" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id,
        |    epoch_us(ts) AS cs, epoch_us(ts) + 300000000 AS ce
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id,
        |    epoch_us(ts) - 1800000000 AS ps, epoch_us(ts) AS pe
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id AS user_id, click_id, purchase_id
        |FROM c JOIN p ON c.user_id = p.user_id AND cs <= pe AND ps <= ce
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,
    // composes the q42 repetition rule, q15 langid agreement, and the q62
    // per-lang exact p25 length gate into one per-doc verdict
    "q76_curation_gate" -> s"$curationGateSql\nORDER BY doc_id",
    "q77_quality_deciles" ->
      """SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(NTILE(10) OVER (PARTITION BY lang
        |    ORDER BY length(text), doc_id) AS BIGINT) AS decile
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q78_cdc_chunks" ->
      s"""WITH $cdcChunksSqlCte
         |SELECT doc_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sp) - 1 AS BIGINT)
         |    AS chunk_idx,
         |  CAST(sp AS BIGINT) AS start_pos,
         |  CAST(ep - sp + 1 AS BIGINT) AS n_tokens,
         |  $cdcChunkHashSql AS chunk_hash
         |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin,
    "q79_chunk_dedup" ->
      s"""WITH $cdcChunksSqlCte,
         |ch AS (
         |  SELECT doc_id, CAST(ep - sp + 1 AS BIGINT) AS n_tokens,
         |    $cdcChunkHashSql AS chunk_hash
         |  FROM chunks)
         |SELECT chunk_hash, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(MIN(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(MIN(doc_id) AS BIGINT) AS keep_doc
         |FROM ch GROUP BY chunk_hash HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY chunk_hash""".stripMargin,
    "q80_zorder_layout" -> {
      val z = graft.operators.Layout.zValue2Sql("l_suppkey", "l_partkey", 16)
      s"""WITH z AS (
         |  SELECT l_suppkey, l_partkey, $z AS zv FROM lineitem)
         |SELECT CAST(zv >> 16 AS BIGINT) AS zbucket,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(MIN(l_suppkey) AS BIGINT) AS min_supp,
         |  CAST(MAX(l_suppkey) AS BIGINT) AS max_supp,
         |  CAST(MIN(l_partkey) AS BIGINT) AS min_part,
         |  CAST(MAX(l_partkey) AS BIGINT) AS max_part
         |FROM z GROUP BY 1 ORDER BY zbucket""".stripMargin
    },
    "q83_join_size" ->
      """WITH c AS (
        |  SELECT l_partkey AS k, COUNT(*) AS n FROM lineitem
        |  WHERE l_partkey IS NOT NULL GROUP BY 1),
        |p AS (
        |  SELECT CAST(a.k AS VARCHAR) AS k, a.n * b.n AS p
        |  FROM c a JOIN c b ON a.k = b.k),
        |rk AS (
        |  SELECT k, p, row_number() OVER (ORDER BY p DESC, k) AS r FROM p),
        |top AS (
        |  SELECT COALESCE(string_agg(k || ':' || p, '|' ORDER BY r), '') AS top_keys
        |  FROM rk WHERE r <= 5)
        |SELECT agg.total_pairs, agg.matched_keys, agg.max_key_pairs, top.top_keys
        |FROM (SELECT COALESCE(CAST(SUM(p) AS BIGINT), 0) AS total_pairs,
        |             CAST(COUNT(*) AS BIGINT) AS matched_keys,
        |             COALESCE(CAST(MAX(p) AS BIGINT), 0) AS max_key_pairs
        |      FROM p) agg CROSS JOIN top""".stripMargin,
    "q82_profile_cat" ->
      """WITH s AS (
        |  SELECT 'lang' AS col_name, lang AS value FROM documents
        |  UNION ALL
        |  SELECT 'source' AS col_name, source AS value FROM documents),
        |c AS (
        |  SELECT col_name, value, COUNT(*) AS cnt FROM s GROUP BY 1, 2),
        |summ AS (
        |  SELECT col_name,
        |    CAST(SUM(cnt) AS BIGINT) AS n,
        |    CAST(COALESCE(SUM(cnt) FILTER (value IS NULL), 0) AS BIGINT) AS n_null,
        |    CAST(COUNT(*) FILTER (value IS NOT NULL) AS BIGINT) AS n_distinct
        |  FROM c GROUP BY 1),
        |rk AS (
        |  SELECT col_name, value, cnt,
        |    row_number() OVER (PARTITION BY col_name ORDER BY cnt DESC, value) AS r
        |  FROM c WHERE value IS NOT NULL),
        |top AS (
        |  SELECT col_name,
        |    string_agg(value || ':' || cnt, '|' ORDER BY r) AS top_values
        |  FROM rk WHERE r <= 5 GROUP BY 1)
        |SELECT summ.col_name, n, n_null, n_distinct, top_values
        |FROM summ LEFT JOIN top ON summ.col_name = top.col_name
        |ORDER BY summ.col_name""".stripMargin,
    "q81_gram_matrix" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(x))) AS ma
        |  FROM embeddings),
        |q AS (
        |  SELECT CASE WHEN ma > 0 THEN list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
        |           AS BIGINT))
        |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS v
        |  FROM e)
        |SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
        |  CAST(SUM(v[i + 1] * v[j + 1]) AS BIGINT) AS g
        |FROM q, range(64) r1(i), range(64) r2(j)
        |WHERE i <= j
        |GROUP BY 1, 2 ORDER BY i, j""".stripMargin,
    "q48_quantized_knn" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(x))) AS ma
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id,
        |    CASE WHEN ma > 0 THEN list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
        |           AS DOUBLE))
        |    ELSE list_transform(embedding, x -> CAST(0.0 AS DOUBLE)) END AS v
        |  FROM e),
        |scored AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    list_dot_product(a.v, b.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        |      AS cos
        |  FROM q a JOIN q b ON a.vec_id < 10 AND a.vec_id <> b.vec_id)
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
        |      AS rank
        |  FROM scored) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q51_stratified_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${graft.operators.Sampling.stratifiedSampleSql("doc_id", "lang",
              stratifiedRates)}
         |ORDER BY doc_id""".stripMargin,
    "q52_asof_join" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |clicks AS (
        |  SELECT user_id, ts AS click_ts,
        |    arg_max(event_id, event_id) AS click_id,
        |    arg_max(value, event_id) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  c.click_id, epoch_us(c.click_ts) AS click_ts_us, c.click_value
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
        |ORDER BY p.event_id""".stripMargin,
    "q84_asof_forward" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |errors AS (
        |  SELECT user_id, ts AS err_ts,
        |    arg_max(event_id, event_id) AS err_id
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  e.err_id, epoch_us(e.err_ts) AS err_ts_us,
        |  epoch_us(e.err_ts) - epoch_us(p.ts) AS us_to_error
        |FROM purchases p ASOF LEFT JOIN errors e
        |  ON p.user_id = e.user_id AND p.ts <= e.err_ts
        |ORDER BY p.event_id""".stripMargin,
    "q53_range_join" ->
      """WITH edays AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |  FROM events WHERE event_type = 'error'),
        |lagged AS (
        |  SELECT user_id, d, LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS pd
        |  FROM edays),
        |grp AS (
        |  SELECT user_id, d,
        |    SUM(CASE WHEN pd IS NULL OR date_diff('day', pd, d) > 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING) AS g
        |  FROM lagged),
        |eps AS (
        |  SELECT user_id,
        |    date_diff('day', DATE '1970-01-01', MIN(d)) AS ep_start,
        |    date_diff('day', DATE '1970-01-01', MAX(d)) AS ep_end,
        |    CAST(COUNT(*) AS BIGINT) AS episode_days
        |  FROM grp GROUP BY user_id, g),
        |purchases AS (
        |  SELECT event_id, user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS p_day
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.event_id, p.p_day, e.ep_start, e.ep_end, e.episode_days
        |FROM purchases p JOIN eps e
        |  ON p.user_id = e.user_id AND p.p_day BETWEEN e.ep_start AND e.ep_end
        |ORDER BY p.user_id, p.event_id, e.ep_start""".stripMargin,
    "q54_sessionize" -> sessionOracleSql,
    // same sessions by construction: the ordered-batch fold telescopes
    // to the one-shot table (q96/q90 proof shape)
    "q112_sessionize_inc" -> sessionOracleSql,
    "q55_scd2_intervals" ->
      """WITH c AS (
        |  SELECT user_id, epoch_us(ts) AS t, MAX(event_type) AS status
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT user_id, t, status,
        |    LAG(status) OVER (PARTITION BY user_id ORDER BY t) AS ps
        |  FROM c),
        |ch AS (SELECT user_id, t, status FROM l WHERE ps IS NULL OR ps <> status),
        |iv AS (
        |  SELECT user_id, status, t AS valid_from_us,
        |    LEAD(t) OVER (PARTITION BY user_id ORDER BY t) AS valid_to_us
        |  FROM ch)
        |SELECT user_id, status, valid_from_us, valid_to_us,
        |  (valid_to_us IS NULL) AS is_current
        |FROM iv ORDER BY user_id, valid_from_us""".stripMargin,
    "q56_bm25_topk" -> {
      val vals = bm25Queries
        .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }.mkString(", ")
      val inList = bm25Queries.flatMap(_._2).distinct.map(t => s"'$t'").mkString(", ")
      s"""WITH q(query_id, term) AS (VALUES $vals),
         |base AS (
         |  SELECT id, CAST(len(tk) AS DOUBLE) AS dl, unnest(tk) AS term
         |  FROM (SELECT doc_id AS id,
         |          string_split_regex(trim(lower(text)), '\\s+') AS tk
         |        FROM documents)),
         |tfq AS (
         |  SELECT id, term, CAST(COUNT(*) AS DOUBLE) AS tf, ANY_VALUE(dl) AS dl
         |  FROM base WHERE term IN ($inList) GROUP BY 1, 2),
         |dfc AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tfq GROUP BY 1),
         |stats AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         |    AVG(CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE))
         |      AS avgdl
         |  FROM documents),
         |scored AS (
         |  SELECT q.query_id, tfq.id,
         |    CAST(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) * tfq.tf * 2.2
         |      / (tfq.tf + 1.2 * (1.0 - 0.75 + 0.75 * tfq.dl / s.avgdl))
         |      AS DECIMAL(38,12)) AS sc
         |  FROM tfq JOIN q ON q.term = tfq.term
         |  JOIN dfc d ON d.term = tfq.term, stats s),
         |agg AS (SELECT query_id, id, SUM(sc) AS score FROM scored GROUP BY 1, 2)
         |SELECT query_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, id)
         |    AS BIGINT) AS rank,
         |  id AS doc_id
         |FROM agg
         |QUALIFY rank <= 10
         |ORDER BY query_id, rank""".stripMargin
    },
    "q57_profile" -> {
      val perCol = profileCols.map { c =>
        s"""SELECT '$c' AS col_name, CAST(COUNT($c) AS BIGINT) AS n,
           |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(MIN($c) AS DOUBLE) AS min_value,
           |  CAST(MAX($c) AS DOUBLE) AS max_value,
           |  median($c) AS median
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"$perCol\nORDER BY col_name"
    },
    "q58_vocab" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |c AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM t
        |  GROUP BY term HAVING COUNT(*) >= 5
        |  ORDER BY n DESC, term LIMIT 100)
        |SELECT term, n,
        |  CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS BIGINT) AS vocab_id
        |FROM c ORDER BY vocab_id""".stripMargin,
    "q59_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS l
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS ngram
        |  FROM toks, unnest(generate_series(1, len(l) - 2)) AS u(i)
        |  WHERE len(l) >= 3),
        |tg AS (SELECT doc_id AS test_id, ngram FROM grams WHERE doc_id % 101 = 0),
        |totals AS (SELECT test_id, CAST(COUNT(*) AS BIGINT) AS test_total FROM tg GROUP BY 1),
        |hits AS (
        |  SELECT g.doc_id, t.test_id, CAST(COUNT(*) AS BIGINT) AS matched
        |  FROM grams g JOIN tg t USING (ngram) GROUP BY 1, 2)
        |SELECT doc_id, test_id, matched, test_total,
        |  CAST(matched AS DOUBLE) / test_total AS overlap_frac
        |FROM hits JOIN totals USING (test_id)
        |WHERE CAST(matched AS DOUBLE) / test_total >= CAST(0.5 AS DOUBLE)
        |ORDER BY doc_id, test_id""".stripMargin,
    "q60_incremental_dedup" -> incrementalDedupOracleSql,
    "q65_incremental_exact" ->
      """WITH f AS (
        |  SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |bg AS (
        |  SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(MIN(doc_id) AS BIGINT) AS keep_id
        |  FROM f WHERE doc_id % 10 = 0 GROUP BY fp)
        |SELECT fp, n_docs, keep_id FROM bg
        |WHERE fp NOT IN (SELECT fp FROM f WHERE doc_id % 10 <> 0)
        |ORDER BY fp""".stripMargin,
    // alternation branches have disjoint first-char classes, so Java's
    // leftmost-first and RE2's leftmost-longest pick identical tokens
    "q66_bpe_tokens" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text,
         |    ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS BIGINT) AS bpe_tokens,
         |  CAST(len(regexp_extract_all(text,
         |    ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS DOUBLE)
         |    / len(regexp_split_to_array(trim(text), '\\s+')) AS ratio
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q64_per_key_sample" ->
      """SELECT lang, CAST(rn AS BIGINT) AS rn, doc_id FROM (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,
    // replays Mixing's integer rate arithmetic verbatim: budget = total//2,
    // uniform weight = 1e6 // n_sources, rate = min(1e6, (budget*w // 1e6)
    // * 1e6 // tokens) — floor divisions only, HUGEINT-safe
    "q63_domain_mix" -> {
      val md5 = graft.functions.PortableHash.md5Hash60Sql("doc_id")
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS t
         |  FROM documents),
         |tot AS (SELECT source, CAST(SUM(t) AS BIGINT) AS st FROM d GROUP BY 1),
         |g AS (SELECT CAST(SUM(st) // 2 AS BIGINT) AS budget,
         |        CAST(1000000 // COUNT(*) AS BIGINT) AS w FROM tot),
         |r AS (SELECT source,
         |        CAST(LEAST(1000000, ((g.budget * g.w // 1000000) * 1000000)
         |          // greatest(st, 1)) AS BIGINT) AS rate_ppm
         |      FROM tot, g),
         |kept AS (
         |  SELECT d.source, r.rate_ppm, d.t FROM d JOIN r USING (source)
         |  WHERE ($md5 % 1000000) < r.rate_ppm)
         |SELECT source, rate_ppm, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(t) AS BIGINT) AS n_tokens
         |FROM kept GROUP BY 1, 2 ORDER BY source""".stripMargin
    },
    "q62_quality_gate" ->
      """WITH d AS (
        |  SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars
        |  FROM documents),
        |th AS (SELECT lang, quantile_cont(n_chars, 0.25) AS p25 FROM d GROUP BY lang)
        |SELECT d.lang, th.p25,
        |  CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_kept
        |FROM d JOIN th USING (lang)
        |WHERE n_chars >= p25
        |GROUP BY 1, 2 ORDER BY lang""".stripMargin,
    "q61_pii_scrub" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
      val phone = "\\b555-[0-9]{4}\\b"
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN
         |      text || ' contact agent' || CAST(doc_id AS VARCHAR)
         |        || '@corp.example.com call 555-'
         |        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |        || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
         |        || '.' || CAST(doc_id % 100 AS VARCHAR)
         |    ELSE text END AS tt
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, tt,
         |    regexp_replace(regexp_replace(regexp_replace(tt,
         |      '$email', '<EMAIL>', 'g'),
         |      '$ip', '<IP>', 'g'),
         |      '$phone', '<PHONE>', 'g') AS clean
         |  FROM t)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(tt, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(tt, '$phone')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(tt, '$ip')) AS BIGINT) AS n_ips,
         |  CAST(length(clean) AS BIGINT) AS clean_len,
         |  md5(clean) AS clean_fp
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "q49_chunking" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |c AS (
        |  SELECT doc_id, tk,
        |    CAST(greatest(ceil(CAST(len(tk) - 16 AS DOUBLE) / 48), 1) AS INT) AS nc
        |  FROM d)
        |SELECT doc_id, CAST(u.i AS INT) AS chunk_idx,
        |  array_to_string(tk[u.i * 48 + 1 : u.i * 48 + 64], ' ') AS chunk_text,
        |  CAST(least(len(tk) - u.i * 48, 64) AS INT) AS n_tokens
        |FROM c, unnest(range(nc)) AS u(i)
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q50_packing" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM d)
        |SELECT doc_id, lang, n_tokens,
        |  CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 2048) AS BIGINT) AS bin,
        |  CAST(cum - n_tokens
        |    - CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 2048) AS BIGINT) * 2048
        |    AS BIGINT) AS bin_offset
        |FROM c ORDER BY lang, doc_id""".stripMargin,
    "q45_sector_baseline_rows" ->
      """WITH daily AS (
        |  SELECT o_custkey AS eid, CAST(o_orderdate AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2),
        |dim AS (SELECT c_custkey AS id, c_mktsegment AS sector FROM customer),
        |base AS (SELECT * FROM daily JOIN dim ON id = eid WHERE sector = 'BUILDING'),
        |mx AS (SELECT max(d) AS end_d FROM base),
        |win AS (SELECT base.*, end_d FROM base, mx WHERE d BETWEEN end_d - 29 AND end_d)
        |SELECT eid AS entity_id, max(sector) AS sector,
        |  CAST(SUM(n) AS DOUBLE) AS window_value,
        |  AVG(n) AS avg_daily_value,
        |  CAST(MAX(CASE WHEN d = end_d THEN n END) AS DOUBLE) AS latest_value,
        |  CAST(MAX(n) AS DOUBLE) AS peak_value,
        |  CAST(COUNT(CASE WHEN n > 0 THEN 1 END) AS BIGINT) AS signal_days
        |FROM win GROUP BY eid ORDER BY entity_id""".stripMargin,
    "q46_crisis_patterns" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2, 3),
        |mx AS (SELECT max(d) AS end_d FROM daily),
        |norm AS (
        |  SELECT d AS dt, CAST(user_id AS VARCHAR) AS eid,
        |    'user_' || CAST(user_id AS VARCHAR) AS ename,
        |    event_type AS tag, lower(event_type) AS tag_key, n AS neg,
        |    CASE WHEN event_type IN ('click', 'view') THEN 'crisis'
        |         WHEN event_type = 'error' THEN 'crisis'
        |         ELSE 'odd_label' END AS grp
        |  FROM daily),
        |ed AS (SELECT DISTINCT tag_key, grp, eid, dt FROM norm),
        |isl AS (
        |  SELECT *, CASE WHEN lag(dt) OVER w IS NULL
        |      OR dt - lag(dt) OVER w > 1 THEN 1 ELSE 0 END AS brk
        |  FROM ed WINDOW w AS (PARTITION BY tag_key, grp, eid ORDER BY dt)),
        |isl2 AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY tag_key, grp, eid ORDER BY dt
        |    ROWS UNBOUNDED PRECEDING) AS island FROM isl),
        |epi AS (
        |  SELECT tag_key, grp, eid, island, CAST(COUNT(*) AS BIGINT) AS episode_days
        |  FROM isl2 GROUP BY 1, 2, 3, 4),
        |dur AS (
        |  SELECT tag_key, grp, CAST(COUNT(*) AS BIGINT) AS episode_count,
        |    quantile_cont(episode_days, 0.5) AS median_duration_days,
        |    CAST(MAX(episode_days) AS BIGINT) AS max_duration_days
        |  FROM epi GROUP BY 1, 2),
        |ra AS (
        |  SELECT tag_key, grp, max(tag) AS tag,
        |    CAST(COUNT(DISTINCT eid) AS BIGINT) AS brands_affected,
        |    CAST(COUNT(DISTINCT CASE WHEN dt = (SELECT end_d FROM mx) THEN eid END)
        |      AS BIGINT) AS active_entities_latest,
        |    CAST(SUM(neg) AS BIGINT) AS total_negative_items
        |  FROM norm GROUP BY 1, 2),
        |pe AS (
        |  SELECT tag_key, grp, eid, SUM(neg) AS etotal, max(ename) AS ename
        |  FROM norm GROUP BY 1, 2, 3),
        |pr AS (
        |  SELECT *, row_number() OVER (PARTITION BY tag_key, grp
        |    ORDER BY etotal DESC, lower(ename)) AS r FROM pe),
        |samples AS (
        |  SELECT tag_key, grp, string_agg(ename, '|' ORDER BY r) AS sample_entities
        |  FROM pr WHERE r <= 3 GROUP BY 1, 2)
        |SELECT ra.tag, CASE WHEN ra.grp = '' THEN NULL ELSE ra.grp END AS "group",
        |  ra.grp = 'crisis' AS is_crisis, ra.brands_affected, dur.episode_count,
        |  dur.median_duration_days, dur.max_duration_days,
        |  ra.active_entities_latest, ra.total_negative_items, samples.sample_entities
        |FROM ra
        |JOIN dur ON dur.tag_key = ra.tag_key AND dur.grp = ra.grp
        |JOIN samples ON samples.tag_key = ra.tag_key AND samples.grp = ra.grp
        |ORDER BY ra.brands_affected DESC, dur.episode_count DESC,
        |  ra.total_negative_items DESC, lower(ra.tag)
        |LIMIT 10""".stripMargin,
    // difflib.SequenceMatcher.ratio() in pure single-statement SQL: the
    // recursive CTE mirrors get_matching_blocks' divide-and-conquer — each
    // live (a-range, b-range) segment finds its longest common substring
    // (ties: smallest i then smallest j, find_longest_match's scan order;
    // autojunk never fires under 200 chars) via a bounded position/length
    // cross-product, then splits into left/right remainder segments plus a
    // dead row carrying the matched length; ratio = 2*sum(m)/(|a|+|b|).
    // Validated char-for-char against CPython difflib over every pair.
    "q31_fuzzy_resolve" ->
      """WITH RECURSIVE
        |dim AS (SELECT n_name FROM nation),
        |q AS (
        |  SELECT DISTINCT lower(substring(n_name, 1, length(n_name) - 1)) AS q
        |  FROM nation),
        |pairs AS (
        |  SELECT q.q, d.n_name, q.q AS a, lower(d.n_name) AS b,
        |    row_number() OVER (ORDER BY q.q, d.n_name) AS pid
        |  FROM q, dim d),
        |gs AS (
        |  SELECT unnest(generate_series(1, (SELECT MAX(length(n_name)) FROM nation))) AS x),
        |seg AS (
        |  SELECT pid, a, b, 1 AS alo, length(a) AS ahi, 1 AS blo, length(b) AS bhi, 0 AS m
        |  FROM pairs
        |  UNION ALL
        |  SELECT f.pid, f.a, f.b,
        |    CASE c.kind WHEN 1 THEN f.alo WHEN 2 THEN f.bi + f.bk ELSE 1 END AS alo,
        |    CASE c.kind WHEN 1 THEN f.bi - 1 WHEN 2 THEN f.ahi ELSE 0 END AS ahi,
        |    CASE c.kind WHEN 1 THEN f.blo WHEN 2 THEN f.bj + f.bk ELSE 1 END AS blo,
        |    CASE c.kind WHEN 1 THEN f.bj - 1 WHEN 2 THEN f.bhi ELSE 0 END AS bhi,
        |    CASE c.kind WHEN 3 THEN f.bk ELSE 0 END AS m
        |  FROM (
        |    SELECT s.pid, s.a, s.b, s.alo, s.ahi, s.blo, s.bhi,
        |           best.i AS bi, best.j AS bj, best.k AS bk
        |    FROM seg s, LATERAL (
        |      SELECT i.x AS i, j.x AS j, k.x AS k
        |      FROM gs i, gs j, gs k
        |      WHERE i.x BETWEEN s.alo AND s.ahi AND j.x BETWEEN s.blo AND s.bhi
        |        AND i.x + k.x - 1 <= s.ahi AND j.x + k.x - 1 <= s.bhi
        |        AND substring(s.a, i.x, k.x) = substring(s.b, j.x, k.x)
        |      ORDER BY k.x DESC, i.x, j.x
        |      LIMIT 1) best
        |    WHERE s.m = 0 AND s.alo <= s.ahi AND s.blo <= s.bhi
        |  ) f, (VALUES (1), (2), (3)) c(kind)),
        |msum AS (SELECT pid, SUM(m) AS mm FROM seg GROUP BY pid),
        |ratio AS (
        |  SELECT p.q, p.n_name,
        |    2.0 * COALESCE(ms.mm, 0) / (length(p.a) + length(p.b)) AS score
        |  FROM pairs p LEFT JOIN msum ms ON ms.pid = p.pid),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY q ORDER BY score DESC, n_name) AS rnk
        |  FROM ratio)
        |SELECT q,
        |  MAX(CASE WHEN rnk = 1 THEN n_name END) AS resolved,
        |  MAX(CASE WHEN rnk = 1 THEN score END) AS score,
        |  MAX(CASE WHEN rnk = 2 THEN score END) AS runner_up,
        |  (MAX(CASE WHEN rnk = 1 THEN score END) >= CAST(0.82 AS DOUBLE) AND
        |   (MAX(CASE WHEN rnk = 1 THEN score END) >= CAST(0.99 AS DOUBLE) OR
        |    COALESCE(MAX(CASE WHEN rnk = 2 THEN score END), CAST(0.0 AS DOUBLE))
        |      < MAX(CASE WHEN rnk = 1 THEN score END) - CAST(0.02 AS DOUBLE)))
        |    AS accepted
        |FROM r WHERE rnk <= 2 GROUP BY q ORDER BY q""".stripMargin,
    "q44_fuzzy_resolve_lev" ->
      """WITH dim AS (SELECT n_name FROM nation),
        |q AS (
        |  SELECT DISTINCT lower(substring(n_name, 1, length(n_name) - 1)) AS q
        |  FROM nation),
        |scored AS (
        |  SELECT q.q, d.n_name,
        |    CAST(1.0 AS DOUBLE) - CAST(levenshtein(q.q, lower(d.n_name)) AS DOUBLE)
        |      / CAST(greatest(length(q.q), length(d.n_name)) AS DOUBLE) AS score
        |  FROM q, dim d),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY q ORDER BY score DESC, n_name) AS rnk
        |  FROM scored)
        |SELECT q,
        |  MAX(CASE WHEN rnk = 1 THEN n_name END) AS resolved,
        |  MAX(CASE WHEN rnk = 1 THEN score END) AS score,
        |  MAX(CASE WHEN rnk = 2 THEN score END) AS runner_up,
        |  (MAX(CASE WHEN rnk = 1 THEN score END) >= CAST(0.82 AS DOUBLE) AND
        |   (MAX(CASE WHEN rnk = 1 THEN score END) >= CAST(0.99 AS DOUBLE) OR
        |    COALESCE(MAX(CASE WHEN rnk = 2 THEN score END), CAST(0.0 AS DOUBLE))
        |      < MAX(CASE WHEN rnk = 1 THEN score END) - CAST(0.02 AS DOUBLE)))
        |    AS accepted
        |FROM r WHERE rnk <= 2 GROUP BY q ORDER BY q""".stripMargin,
    "q01_pricing_pivot" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(COUNT(*) AS BIGINT) AS count_order,
        |  CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS high_discount_count,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_region_revenue" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS order_cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q03_effective_status" ->
      """WITH latest AS (
        |  SELECT o_custkey, o_orderstatus,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |SELECT c_custkey, c_mktsegment, l.o_orderstatus AS latest_status,
        |  COALESCE(l.o_orderstatus, c_mktsegment) AS eff_status
        |FROM customer c LEFT JOIN (SELECT * FROM latest WHERE rn = 1) l
        |  ON c.c_custkey = l.o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q04_union_daily" ->
      """WITH tagged AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, 'orders' AS src FROM orders
        |  UNION ALL
        |  SELECT CAST(l_shipdate AS DATE) AS d, 'ship' AS src FROM lineitem)
        |SELECT d,
        |  CAST(SUM(CASE WHEN src = 'orders' THEN 1 ELSE 0 END) AS BIGINT) AS orders_cnt,
        |  CAST(SUM(CASE WHEN src = 'ship' THEN 1 ELSE 0 END) AS BIGINT) AS ship_cnt,
        |  CAST(COUNT(*) AS BIGINT) AS total_cnt
        |FROM tagged GROUP BY d ORDER BY d""".stripMargin,
    "q05_trailing7" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS v, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, d,
        |  CAST(SUM(n) OVER w AS BIGINT) AS n7,
        |  CAST(SUM(v) OVER w AS DOUBLE) AS v7,
        |  MIN(d) OVER w AS win_start
        |FROM daily
        |WINDOW w AS (PARTITION BY user_id ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, d""".stripMargin,
    "q06_anomaly_baseline" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |scored AS (
        |  SELECT user_id, d, n,
        |    COUNT(*) OVER w AS prior_days,
        |    SUM(n) OVER w AS prior_total
        |  FROM daily
        |  WINDOW w AS (PARTITION BY user_id ORDER BY d ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, d, CAST(n AS BIGINT) AS n,
        |  CAST(prior_days AS BIGINT) AS prior_days,
        |  CAST(prior_total AS DOUBLE) / prior_days AS baseline
        |FROM scored
        |WHERE prior_days >= 7 AND n >= 2.0 * (CAST(prior_total AS DOUBLE) / prior_days)
        |ORDER BY user_id, d""".stripMargin,
    "q07_gaps_islands" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |lagged AS (
        |  SELECT user_id, d, LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS pd FROM days),
        |grp AS (
        |  SELECT user_id, d,
        |    SUM(CASE WHEN pd IS NULL OR date_diff('day', pd, d) > 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING) AS g
        |  FROM lagged)
        |SELECT user_id, MIN(d) AS episode_start, MAX(d) AS episode_end,
        |  CAST(COUNT(*) AS BIGINT) AS episode_days
        |FROM grp GROUP BY user_id, g ORDER BY user_id, episode_start""".stripMargin,
    "q08_latest_dedup" ->
      """SELECT user_id, event_type, event_id, CAST(ts AS DATE) AS d, value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q09_top3_names" ->
      """SELECT p_brand,
        |  array_to_string(list_sort(array_agg(p_name) FILTER (WHERE p_size > 25))[1:3], ' | ') AS top_names,
        |  CAST(COUNT(*) FILTER (WHERE p_size > 25) AS BIGINT) AS n_large
        |FROM part GROUP BY p_brand
        |HAVING COUNT(*) FILTER (WHERE p_size > 25) > 0
        |ORDER BY p_brand""".stripMargin,
    "q10_screen_top_spenders" ->
      """SELECT o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS peak_order,
        |  CAST(COUNT(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT) AS big_orders,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY o_custkey
        |HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) >= 100000
        |ORDER BY total_spend DESC, o_custkey LIMIT 20""".stripMargin,
    "q11_median_price" ->
      """SELECT o_orderpriority, median(o_totalprice) AS median_price,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q12_pagination" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
        |        ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn > 100 AND rn <= 150 ORDER BY rn""".stripMargin,
    "q13_token_stats" ->
      """SELECT doc_id, lang,
        |  CAST(length(text) AS BIGINT) AS n_chars2,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS DOUBLE) / len(regexp_split_to_array(trim(text), '\s+')) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q14_doc_fingerprint" ->
      """SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(MIN(doc_id) AS BIGINT) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "q15_lang_id" -> s"$langIdSql\nORDER BY doc_id",
    "q39_lang_confusion" ->
      s"""WITH pred AS ($langIdSql),
         |counts AS (
         |  SELECT lang AS expected, predicted_lang AS predicted,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM pred GROUP BY 1, 2),
         |totals AS (
         |  SELECT expected, CAST(SUM(n) AS BIGINT) AS class_total
         |  FROM counts GROUP BY 1)
         |SELECT c.expected, c.predicted, c.n, t.class_total,
         |  CAST(c.n AS DOUBLE) / t.class_total AS class_share
         |FROM counts c JOIN totals t ON c.expected = t.expected
         |ORDER BY c.expected, c.predicted""".stripMargin,
    "q20_active_propagation" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |flags AS (SELECT user_id, d, n, n >= 5 AS s, n >= 3 AS c FROM daily),
        |isl AS (
        |  SELECT *, SUM(CASE WHEN pd IS NULL OR date_diff('day', pd, d) > 1 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING) AS island
        |  FROM (SELECT *, LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS pd FROM flags)),
        |seg AS (
        |  SELECT *, SUM(CASE WHEN c THEN 0 ELSE 1 END)
        |    OVER (PARTITION BY user_id, island ORDER BY d ROWS UNBOUNDED PRECEDING) AS segment
        |  FROM isl),
        |act AS (
        |  SELECT *, MAX(CASE WHEN s THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id, island, segment ORDER BY d ROWS UNBOUNDED PRECEDING) = 1 AS chain_s
        |  FROM seg)
        |SELECT user_id, d, CAST(n AS BIGINT) AS n, (s OR (c AND chain_s)) AS active
        |FROM act ORDER BY user_id, d""".stripMargin,
    "q21_trailing_streak" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, d, n,
        |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d DESC) AS rn
        |      FROM daily)
        |SELECT user_id,
        |  CAST(COALESCE(MIN(CASE WHEN n < 3 THEN rn END) - 1, COUNT(*)) AS BIGINT) AS streak_days
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q22_lag_delta" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT a.user_id, a.d, CAST(a.n AS BIGINT) AS n, CAST(b.n AS BIGINT) AS prior_n,
        |  CAST(a.n - b.n AS BIGINT) AS delta,
        |  CAST(a.n AS DOUBLE) / b.n AS ratio
        |FROM daily a JOIN daily b
        |  ON a.user_id = b.user_id AND b.d = a.d - 1
        |ORDER BY a.user_id, a.d""".stripMargin,
    "q23_anchored_weekly" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |latest AS (SELECT user_id, MAX(d) AS l FROM daily GROUP BY 1),
        |anchors AS (
        |  SELECT user_id, l - CAST(7 * k AS INTEGER) AS anchor
        |  FROM latest, (SELECT unnest(range(4)) AS k))
        |SELECT a.user_id, a.anchor, CAST(COALESCE(SUM(dd.n), 0) AS BIGINT) AS n7
        |FROM anchors a LEFT JOIN daily dd
        |  ON dd.user_id = a.user_id AND dd.d BETWEEN a.anchor - 6 AND a.anchor
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q24_pipe_series" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, SUM(CAST(value AS DECIMAL(18,2))) AS v
        |  FROM events GROUP BY 1, 2),
        |series AS (
        |  SELECT user_id,
        |    string_agg(CAST(v AS VARCHAR), '|' ORDER BY d) AS vh,
        |    string_agg(CAST(d AS VARCHAR), '|' ORDER BY d) AS dh
        |  FROM daily GROUP BY user_id),
        |pct AS (
        |  SELECT *, string_split(vh, '|') AS vl FROM series),
        |pct2 AS (
        |  SELECT user_id, vh, dh,
        |    CASE WHEN len(vl) >= 2 AND CAST(vl[-2] AS DOUBLE) <> 0.0
        |         THEN (CAST(vl[-1] AS DOUBLE) - CAST(vl[-2] AS DOUBLE)) / CAST(vl[-2] AS DOUBLE) * 100.0
        |    END AS daily_change_pct
        |  FROM pct)
        |SELECT user_id, CAST(d_str AS DATE) AS d, CAST(v_str AS DOUBLE) AS v, daily_change_pct
        |FROM (SELECT user_id, daily_change_pct,
        |        unnest(string_split(dh, '|')) AS d_str,
        |        unnest(string_split(vh, '|')) AS v_str
        |      FROM pct2)
        |ORDER BY user_id, d""".stripMargin,
    "q25_semi_join_scope" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM customer
        |              WHERE c_custkey = o_custkey AND c_acctbal > 5000)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q26_sector_baseline" ->
      """WITH by_nation AS (
        |  SELECT n_name, n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_custs,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
        |    median(c_acctbal) AS median_bal
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, n_regionkey)
        |SELECT n_name, n_regionkey, n_custs, total_bal, median_bal,
        |  CAST(RANK() OVER w AS BIGINT) AS rnk,
        |  PERCENT_RANK() OVER w AS pct_rank
        |FROM by_nation
        |WINDOW w AS (PARTITION BY n_regionkey ORDER BY total_bal DESC, n_name)
        |ORDER BY n_regionkey, rnk""".stripMargin,
    "q27_index_rollup" ->
      """SELECT CAST(ts AS DATE) AS d, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q28_topk_composite" ->
      """SELECT p_partkey, p_name, p_retailprice
        |FROM part
        |ORDER BY p_retailprice DESC, lower(p_name), p_partkey
        |LIMIT 10""".stripMargin,
    "q34_signal_score" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_cnt,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_cnt,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_cnt,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup_cnt,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view_cnt,
        |  SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) * CAST(0.24 AS DOUBLE)
        |    + SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * CAST(0.16 AS DOUBLE)
        |    + SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * CAST(0.12 AS DOUBLE)
        |    + SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) * CAST(0.10 AS DOUBLE)
        |    + SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) * CAST(0.24 AS DOUBLE) AS signal_score
        |FROM events GROUP BY user_id
        |ORDER BY signal_score DESC, user_id LIMIT 50""".stripMargin,
    "q35_distinct_users" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q37_evidence_histogram" ->
      """SELECT event_type,
        |  CASE WHEN value >= 100 THEN 'high' WHEN value >= 30 THEN 'mid'
        |       ELSE 'low' END AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin,
    "q38_storyline_scores" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |lagged AS (
        |  SELECT user_id, d, n, LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS pd FROM daily),
        |grp AS (
        |  SELECT user_id, d, n,
        |    SUM(CASE WHEN pd IS NULL OR date_diff('day', pd, d) > 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING) AS g
        |  FROM lagged),
        |episodes AS (
        |  SELECT user_id, g, CAST(COUNT(*) AS BIGINT) AS episode_days
        |  FROM grp GROUP BY user_id, g),
        |per_bucket AS (
        |  SELECT user_id % 5 AS bucket,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS affected,
        |    CAST(SUM(n) AS BIGINT) AS items
        |  FROM daily GROUP BY 1),
        |bucket_dur AS (
        |  SELECT user_id % 5 AS bucket,
        |    CAST(SUM(episode_days) AS DOUBLE) / COUNT(*) AS avg_dur,
        |    CAST(SUM(episode_days) AS BIGINT) AS active_days
        |  FROM episodes GROUP BY 1)
        |SELECT b.bucket, b.affected, b.items, d.avg_dur, d.active_days,
        |  b.affected * CAST(6.0 AS DOUBLE) + b.items * CAST(0.35 AS DOUBLE)
        |    + d.avg_dur * CAST(2.0 AS DOUBLE) + d.active_days * CAST(0.4 AS DOUBLE) AS score
        |FROM per_bucket b JOIN bucket_dur d ON b.bucket = d.bucket
        |ORDER BY score DESC, b.bucket""".stripMargin,
    // cosine similarity itself is excluded from both projections: DuckDB's
    // list_cosine_similarity on FLOAT[] accumulates in float (~1e-7 off our
    // double); rankings still agree because measured adjacent-rank margins
    // are >= 1e-5 at sf0.01/sf0.1 (see cosineKnn scaladoc).
    "q16_cosine_knn" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |pairs AS (
        |  SELECT q.qid, c.vec_id AS nid,
        |         list_cosine_similarity(q.qv, c.embedding) AS cos
        |  FROM q JOIN embeddings c ON c.vec_id <> q.qid)
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT qid AS query_id, nid AS neighbor_id,
        |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |  FROM pairs) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q17_cosine_ivf" ->
      """WITH cents AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id, embedding AS cent
        |  FROM embeddings ORDER BY vec_id LIMIT 16),
        |corpus_assign AS (
        |  SELECT e.vec_id AS nid, e.embedding AS vec, c.cent_id,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC, c.cent_id) AS r
        |  FROM embeddings e, cents c),
        |bucketed AS (SELECT nid, vec, cent_id AS bucket FROM corpus_assign WHERE r = 1),
        |probes AS (
        |  SELECT qid, qv, bucket FROM (
        |    SELECT e.vec_id AS qid, e.embedding AS qv, c.cent_id AS bucket,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC, c.cent_id) AS r
        |    FROM embeddings e, cents c WHERE e.vec_id < 10) t
        |  WHERE r <= 4),
        |scored AS (
        |  SELECT p.qid, b.nid, list_cosine_similarity(p.qv, b.vec) AS cos
        |  FROM bucketed b JOIN probes p ON b.bucket = p.bucket AND p.qid <> b.nid)
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT qid AS query_id, nid AS neighbor_id,
        |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |  FROM scored) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q29_narrative_rollup" -> narrativeOracleSql,
    "q42_repetition_stats" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
        |uni AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
        |    CAST(MAX(c) AS BIGINT) AS top_token_count
        |  FROM tc GROUP BY 1),
        |d AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |      FROM documents),
        |bg0 AS (
        |  SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg
        |  FROM d, unnest(generate_series(1, greatest(len(w) - 1, 1))) AS u(i)
        |  WHERE len(w) >= 2
        |  UNION ALL
        |  SELECT doc_id, array_to_string(w, ' ') FROM d WHERE len(w) < 2),
        |bc AS (SELECT doc_id, bg, count(*) AS c FROM bg0 GROUP BY 1, 2),
        |bi AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |    CAST(MAX(c) AS BIGINT) AS top_bigram_count
        |  FROM bc GROUP BY 1)
        |SELECT doc_id, n_tokens, distinct_tokens, top_token_count,
        |  n_bigrams, top_bigram_count,
        |  CAST(distinct_tokens AS DOUBLE) / n_tokens AS distinct_ratio,
        |  CAST(top_token_count AS DOUBLE) / n_tokens AS top_token_frac,
        |  CAST(top_bigram_count AS DOUBLE) / n_bigrams AS top_bigram_frac,
        |  (CAST(top_token_count AS DOUBLE) / n_tokens > CAST(0.1 AS DOUBLE)
        |    OR CAST(top_bigram_count AS DOUBLE) / n_bigrams > CAST(0.05 AS DOUBLE))
        |    AS repetitive
        |FROM uni JOIN bi USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q30_control_classify" -> controlOracleSql,
    // Image rows are a REAL PNG encode->ImageIO.read round-trip; the pixel
    // law gray = (id*31 + x*7 + y*13) % 256 is integer-exact, so the oracle
    // replays the decoded checksum without ever touching the codec. Audio/
    // video rows are opaque stand-ins (no codec) -> decode_ok false.
    "q32_multimodal_decode" ->
      """WITH img AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 32 + 1 AS INTEGER) AS w,
        |    CAST(doc_id % 24 + 1 AS INTEGER) AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |px AS (
        |  SELECT doc_id,
        |    CAST(sum((doc_id * 31 + xs.x * 7 + ys.y * 13) % 256) AS BIGINT)
        |      AS gray_sum
        |  FROM img,
        |    unnest(generate_series(0, CAST(w AS BIGINT) - 1)) AS xs(x),
        |    unnest(generate_series(0, CAST(h AS BIGINT) - 1)) AS ys(y)
        |  GROUP BY 1)
        |SELECT d.doc_id AS media_id,
        |  CASE WHEN d.doc_id % 3 = 0 THEN 'image'
        |       WHEN d.doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  (d.doc_id % 3 = 0) AS decode_ok,
        |  CAST(8 AS INTEGER) AS feature_dim,
        |  img.w AS decoded_width,
        |  img.h AS decoded_height,
        |  px.gray_sum
        |FROM documents d
        |LEFT JOIN img ON d.doc_id = img.doc_id
        |LEFT JOIN px ON d.doc_id = px.doc_id
        |ORDER BY media_id""".stripMargin,
    "q36_random_sample" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
        |LIMIT 100""".stripMargin,
    "q40_jaccard_verify" ->
      """WITH d AS (
        |  SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents WHERE doc_id < 200),
        |sh AS (
        |  SELECT DISTINCT doc_id, lang, s FROM (
        |    SELECT doc_id, lang,
        |      CASE WHEN len(w) < 2 THEN array_to_string(w, ' ')
        |           ELSE w[i] || ' ' || w[i + 1] END AS s
        |    FROM d, unnest(generate_series(1, greatest(len(w) - 1, 1))) AS u(i)) t),
        |counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS m
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  CAST(m AS DOUBLE) / (ca.n + cb.n - m) AS jaccard
        |FROM inter
        |JOIN counts ca ON ca.doc_id = id_a
        |JOIN counts cb ON cb.doc_id = id_b
        |WHERE CAST(m AS DOUBLE) / (ca.n + cb.n - m) >= CAST(0.08 AS DOUBLE)
        |ORDER BY id_a, id_b""".stripMargin,
    "q41_quality_score" ->
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         |  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) AS n_nonspace,
         |  CAST(${qHits(Seq("the", "a", "and", "of"))} AS BIGINT) AS stop_hits,
         |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
         |    AS n_digits,
         |  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |    / len(string_split_regex(trim(text), '\\s+')) AS mean_token_len,
         |  CAST(${qHits(Seq("the", "a", "and", "of"))} AS DOUBLE)
         |    / len(string_split_regex(trim(text), '\\s+')) AS stopword_ratio,
         |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
         |    / length(text) AS digit_ratio,
         |  len(string_split_regex(trim(text), '\\s+')) BETWEEN 20 AND 2000
         |    AND ${qHits(Seq("the", "a", "and", "of"))} >= 1 AS quality_ok
         |FROM documents ORDER BY doc_id""".stripMargin,
    // the bloom prune is result-invisible (fpp residue removed by the
    // exact semi join) — the oracle is the PLAIN semi-join aggregate
    "q97_bloom_prune" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 48)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // full-outer replay of the snapshot derivation; IS DISTINCT FROM is
    // the null-safe twin of Spark's <=>; concat_ws skips NULLs in both
    // engines, so the changed-column list builds identically
    "q98_table_diff" ->
      """WITH old AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |nw AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |j AS (
        |  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |    o.o_orderkey IS NOT NULL AS in_old, n.o_orderkey IS NOT NULL AS in_new,
        |    o.o_orderstatus IS DISTINCT FROM n.o_orderstatus AS d_status,
        |    o.o_totalprice IS DISTINCT FROM n.o_totalprice AS d_price
        |  FROM old o FULL JOIN nw n ON o.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey,
        |  CASE WHEN NOT in_old THEN 'added' WHEN NOT in_new THEN 'removed'
        |       WHEN d_status OR d_price THEN 'changed'
        |       ELSE 'unchanged' END AS change,
        |  CASE WHEN in_old AND in_new THEN concat_ws(',',
        |         CASE WHEN d_status THEN 'o_orderstatus' END,
        |         CASE WHEN d_price THEN 'o_totalprice' END)
        |       ELSE '' END AS changed_cols
        |FROM j
        |WHERE NOT (in_old AND in_new AND NOT d_status AND NOT d_price)
        |ORDER BY o_orderkey""".stripMargin,
    // spine replay via generate_series; LAST_VALUE IGNORE NULLS over a
    // ROWS frame is the forward fill in both engines; max() is
    // comparison-only (no float arithmetic), so doubles are bit-stable
    "q99_gap_fill" ->
      """WITH obs AS (
        |  SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS d,
        |    MAX(o_totalprice) AS mx
        |  FROM orders WHERE o_totalprice > 450000 GROUP BY 1, 2),
        |span AS (SELECT pri, MIN(d) AS d0, MAX(d) AS d1 FROM obs GROUP BY pri),
        |spine AS (
        |  SELECT pri, CAST(u.g AS DATE) AS d
        |  FROM span, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS u(g)),
        |j AS (
        |  SELECT s.pri, s.d, o.mx, o.pri IS NOT NULL AS present
        |  FROM spine s LEFT JOIN obs o ON s.pri = o.pri AND s.d = o.d)
        |SELECT pri, d, mx,
        |  LAST_VALUE(mx IGNORE NULLS) OVER (PARTITION BY pri ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx_filled,
        |  NOT present AS is_gap
        |FROM j
        |ORDER BY pri, d""".stripMargin,
    // quantile_cont is the R-7 interpolation the kernel reproduces
    // bit-for-bit (q57/q62 precedent); fences reuse the same association
    // order (q1 - k*(q3-q1)) so the IEEE doubles match exactly
    "q100_iqr_outliers" ->
      """WITH b AS (
        |  SELECT event_type, quantile_cont(value, 0.25) AS q1,
        |    quantile_cont(value, 0.75) AS q3
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type)
        |SELECT b.event_type, CAST(COUNT(*) AS BIGINT) AS n, b.q1, b.q3,
        |  b.q1 - 1.5 * (b.q3 - b.q1) AS lo,
        |  b.q3 + 1.5 * (b.q3 - b.q1) AS hi,
        |  CAST(SUM(CASE WHEN e.value < b.q1 - 1.5 * (b.q3 - b.q1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(SUM(CASE WHEN e.value > b.q3 + 1.5 * (b.q3 - b.q1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  CAST(SUM(CASE WHEN e.value < b.q1 - 1.5 * (b.q3 - b.q1)
        |    OR e.value > b.q3 + 1.5 * (b.q3 - b.q1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM events e JOIN b ON e.event_type = b.event_type
        |WHERE e.value IS NOT NULL
        |GROUP BY b.event_type, b.q1, b.q3
        |ORDER BY b.event_type""".stripMargin,
    // downward closure makes the item pre-filter result-invisible at one
    // shared threshold, so the oracle replays the same three stages
    "q101_frequent_pairs" ->
      """WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS b, p_brand AS i
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |f AS (SELECT i FROM bi GROUP BY i HAVING COUNT(*) >= 350),
        |bf AS (SELECT b, i FROM bi WHERE i IN (SELECT i FROM f)),
        |p AS (
        |  SELECT a.i AS item_a, b2.i AS item_b,
        |    CAST(COUNT(*) AS BIGINT) AS pair_count
        |  FROM bf a JOIN bf b2 ON a.b = b2.b AND a.i < b2.i
        |  GROUP BY 1, 2)
        |SELECT item_a, item_b, pair_count FROM p
        |WHERE pair_count >= 350
        |ORDER BY item_a, item_b""".stripMargin,
    "q102_hash_split" -> {
      val b = graft.operators.Splits.bucketSql("doc_id")
      s"""SELECT doc_id, lang, $b AS bucket,
         |  CASE WHEN $b < 800000 THEN 'train'
         |       WHEN $b < 900000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    // exact co-moment sums in the cents domain (BIGINT products, HUGEINT
    // sums == Spark's decimal(38,0) sums), then the identical final IEEE
    // sequence — bit-stable where native corr() would drift
    "q103_pearson" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |    CAST(ROUND(l_quantity * 100.0) AS BIGINT) AS x,
        |    CAST(ROUND(l_extendedprice * 100.0) AS BIGINT) AS y
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x*x) AS DOUBLE) AS sxx, CAST(SUM(y*y) AS DOUBLE) AS syy,
        |    CAST(SUM(x*y) AS DOUBLE) AS sxy
        |  FROM c GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
        |    THEN (n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))
        |    END AS r,
        |  CASE WHEN n*sxx - sx*sx > 0
        |    THEN (n*sxy - sx*sy) / (n*sxx - sx*sx) END AS slope
        |FROM s ORDER BY l_returnflag""".stripMargin,
    // integer marginals from the cell table; expected/contribution are the
    // same fixed IEEE sequence per cell — no float aggregation to drift
    "q104_contingency" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS observed
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY lang, source),
        |m AS (
        |  SELECT lang, source, observed,
        |    SUM(observed) OVER (PARTITION BY lang) AS row_total,
        |    SUM(observed) OVER (PARTITION BY source) AS col_total,
        |    SUM(observed) OVER () AS n
        |  FROM cells)
        |SELECT lang, source, observed,
        |  CAST(row_total AS BIGINT) AS row_total,
        |  CAST(col_total AS BIGINT) AS col_total,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(row_total * col_total AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
        |  (CAST(observed AS DOUBLE) - CAST(row_total * col_total AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (CAST(observed AS DOUBLE) - CAST(row_total * col_total AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(row_total * col_total AS DOUBLE) / CAST(n AS DOUBLE)) AS contribution
        |FROM m ORDER BY lang, source""".stripMargin,
    // q44's normalized-Levenshtein score, replayed through the same
    // prefix-2 blocking both engines compute identically
    "q105_blocked_resolve" ->
      """WITH p AS (
        |  SELECT DISTINCT substring(p_name, 1, length(p_name) - 1) AS q
        |  FROM part WHERE p_name IS NOT NULL),
        |c AS (SELECT DISTINCT p_name AS cand FROM part WHERE p_name IS NOT NULL),
        |pb AS (SELECT q, substring(lower(q), 1, 2) AS bk FROM p),
        |cb AS (SELECT cand, substring(lower(cand), 1, 2) AS bk FROM c),
        |s AS (
        |  SELECT pb.q, cb.cand,
        |    CAST(1.0 AS DOUBLE)
        |      - CAST(levenshtein(lower(pb.q), lower(cb.cand)) AS DOUBLE)
        |        / CAST(greatest(length(pb.q), length(cb.cand)) AS DOUBLE) AS score
        |  FROM pb JOIN cb USING (bk)),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY q ORDER BY score DESC, cand) AS rnk
        |  FROM s)
        |SELECT q, cand AS resolved, score FROM r
        |WHERE rnk = 1 AND score >= 0.5
        |ORDER BY q""".stripMargin,
    // quantile_cont twice (median, then median of |v − med|); fence
    // arithmetic keeps the kernel's association order (med ± 3·mad) so
    // the IEEE doubles replay exactly (q100 precedent)
    "q106_mad_outliers" ->
      """WITH m AS (
        |  SELECT o_orderpriority AS pri, quantile_cont(o_totalprice, 0.5) AS med
        |  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
        |d AS (
        |  SELECT m.pri, o.o_totalprice AS v, m.med,
        |    ABS(o.o_totalprice - m.med) AS ad
        |  FROM orders o JOIN m ON o.o_orderpriority = m.pri
        |  WHERE o.o_totalprice IS NOT NULL),
        |md AS (SELECT pri, quantile_cont(ad, 0.5) AS mad FROM d GROUP BY pri)
        |SELECT d.pri, CAST(COUNT(*) AS BIGINT) AS n, d.med, md.mad,
        |  d.med - 3.0 * md.mad AS lo, d.med + 3.0 * md.mad AS hi,
        |  CAST(SUM(CASE WHEN d.v < d.med - 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(SUM(CASE WHEN d.v > d.med + 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  CAST(SUM(CASE WHEN d.v < d.med - 3.0 * md.mad
        |    OR d.v > d.med + 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM d JOIN md ON d.pri = md.pri
        |GROUP BY d.pri, d.med, md.mad
        |ORDER BY d.pri""".stripMargin,
    // lead(id, k) over (partition by block order by sk, id) ≡ self-join
    // on rank distance 1..w−1; q105's score expression on the union of
    // the two passes
    "q107_sorted_neighborhood" ->
      """WITH s1 AS (
        |  SELECT p_partkey AS id, lower(p_name) AS sk,
        |    substring(lower(p_name), 1, 2) AS blk
        |  FROM part WHERE p_partkey IS NOT NULL AND p_name IS NOT NULL),
        |r1 AS (SELECT id, blk,
        |  row_number() OVER (PARTITION BY blk ORDER BY sk, id) AS rn FROM s1),
        |s2 AS (
        |  SELECT p_partkey AS id, reverse(lower(p_name)) AS sk,
        |    substring(reverse(lower(p_name)), 1, 2) AS blk
        |  FROM part WHERE p_partkey IS NOT NULL AND p_name IS NOT NULL),
        |r2 AS (SELECT id, blk,
        |  row_number() OVER (PARTITION BY blk ORDER BY sk, id) AS rn FROM s2),
        |c AS (
        |  SELECT DISTINCT id_a, id_b FROM (
        |    SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b
        |    FROM r1 a JOIN r1 b
        |      ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 4
        |    UNION ALL
        |    SELECT least(a.id, b.id), greatest(a.id, b.id)
        |    FROM r2 a JOIN r2 b
        |      ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 4)),
        |sc AS (
        |  SELECT c.id_a, c.id_b,
        |    1.0 - CAST(levenshtein(lower(x.p_name), lower(y.p_name)) AS DOUBLE)
        |        / CAST(greatest(length(x.p_name), length(y.p_name)) AS DOUBLE) AS score
        |  FROM c JOIN part x ON c.id_a = x.p_partkey
        |         JOIN part y ON c.id_b = y.p_partkey)
        |SELECT id_a, id_b, score FROM sc WHERE score >= 0.6
        |ORDER BY id_a, id_b""".stripMargin,
    // a zone scans iff its [min, max] envelope overlaps the predicate
    // interval — all-integer accounting, so the replay is exact
    "q108_zone_map" ->
      """WITH li AS (
        |  SELECT l_orderkey AS k, CAST(l_shipdate AS DATE) AS d
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_shipdate IS NOT NULL),
        |z1 AS (
        |  SELECT CAST((k - k % 1000) / 1000 AS BIGINT) AS z, COUNT(*) AS n,
        |    MIN(d) AS mn, MAX(d) AS mx,
        |    SUM(CASE WHEN d BETWEEN DATE '1997-01-01' AND DATE '1997-03-31'
        |      THEN 1 ELSE 0 END) AS m
        |  FROM li GROUP BY 1),
        |z2 AS (
        |  SELECT date_trunc('month', d) AS z, COUNT(*) AS n,
        |    MIN(d) AS mn, MAX(d) AS mx,
        |    SUM(CASE WHEN d BETWEEN DATE '1997-01-01' AND DATE '1997-03-31'
        |      THEN 1 ELSE 0 END) AS m
        |  FROM li GROUP BY 1),
        |s1 AS (
        |  SELECT 'natural' AS layout, CAST(COUNT(*) AS BIGINT) AS zones_total,
        |    CAST(COALESCE(SUM(CASE WHEN mx >= DATE '1997-01-01'
        |      AND mn <= DATE '1997-03-31' THEN 1 ELSE 0 END), 0) AS BIGINT) AS zones_scanned,
        |    CAST(COALESCE(SUM(n), 0) AS BIGINT) AS rows_total,
        |    CAST(COALESCE(SUM(CASE WHEN mx >= DATE '1997-01-01'
        |      AND mn <= DATE '1997-03-31' THEN n END), 0) AS BIGINT) AS rows_scanned,
        |    CAST(COALESCE(SUM(m), 0) AS BIGINT) AS rows_matched
        |  FROM z1),
        |s2 AS (
        |  SELECT 'by_month' AS layout, CAST(COUNT(*) AS BIGINT) AS zones_total,
        |    CAST(COALESCE(SUM(CASE WHEN mx >= DATE '1997-01-01'
        |      AND mn <= DATE '1997-03-31' THEN 1 ELSE 0 END), 0) AS BIGINT) AS zones_scanned,
        |    CAST(COALESCE(SUM(n), 0) AS BIGINT) AS rows_total,
        |    CAST(COALESCE(SUM(CASE WHEN mx >= DATE '1997-01-01'
        |      AND mn <= DATE '1997-03-31' THEN n END), 0) AS BIGINT) AS rows_scanned,
        |    CAST(COALESCE(SUM(m), 0) AS BIGINT) AS rows_matched
        |  FROM z2)
        |SELECT * FROM s1 UNION ALL SELECT * FROM s2 ORDER BY layout""".stripMargin,
    // all-integer counters; pass = zero violations; anchored regex keeps
    // rlike and regexp_matches agreeing
    "q109_expectations" ->
      """WITH rl AS (
        |  SELECT
        |    CAST(COUNT(*) AS BIGINT) AS nn_c,
        |    CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS nn_v,
        |    CAST(COALESCE(SUM(CASE WHEN o_totalprice IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS ir_c,
        |    CAST(COALESCE(SUM(CASE WHEN o_totalprice IS NOT NULL
        |      AND NOT (o_totalprice BETWEEN 0.0 AND 450000.0) THEN 1 ELSE 0 END), 0) AS BIGINT) AS ir_v,
        |    CAST(COALESCE(SUM(CASE WHEN o_orderstatus IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS is_c,
        |    CAST(COALESCE(SUM(CASE WHEN o_orderstatus IS NOT NULL
        |      AND o_orderstatus NOT IN ('F', 'O') THEN 1 ELSE 0 END), 0) AS BIGINT) AS is_v,
        |    CAST(COALESCE(SUM(CASE WHEN o_orderpriority IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS re_c,
        |    CAST(COALESCE(SUM(CASE WHEN o_orderpriority IS NOT NULL
        |      AND NOT regexp_matches(o_orderpriority, '^[1-3]-') THEN 1 ELSE 0 END), 0) AS BIGINT) AS re_v
        |  FROM orders),
        |uk AS (
        |  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS c,
        |    CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n END), 0) AS BIGINT) AS v
        |  FROM (SELECT COUNT(*) AS n FROM orders
        |        WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey)),
        |uc AS (
        |  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS c,
        |    CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n END), 0) AS BIGINT) AS v
        |  FROM (SELECT COUNT(*) AS n FROM orders
        |        WHERE o_custkey IS NOT NULL GROUP BY o_custkey)),
        |fk AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS c,
        |    CAST(COALESCE(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS v
        |  FROM lineitem l
        |  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_orderkey IS NOT NULL)
        |SELECT check_name, n_checked, n_violations, n_violations = 0 AS pass FROM (
        |  SELECT 'not_null:o_custkey' AS check_name, nn_c AS n_checked, nn_v AS n_violations FROM rl
        |  UNION ALL SELECT 'in_range:o_totalprice', ir_c, ir_v FROM rl
        |  UNION ALL SELECT 'in_set:o_orderstatus', is_c, is_v FROM rl
        |  UNION ALL SELECT 'regex:o_orderpriority', re_c, re_v FROM rl
        |  UNION ALL SELECT 'unique:o_orderkey', c, v FROM uk
        |  UNION ALL SELECT 'unique:o_custkey', c, v FROM uc
        |  UNION ALL SELECT 'fk:l_orderkey', c, v FROM fk)
        |ORDER BY check_name""".stripMargin,
    // lower weighted quantile: smallest v with cumweight >= ceil(p*W) —
    // integer weights, q13's token expression, no interpolation anywhere
    "q110_weighted_quantiles" ->
      """WITH d AS (
        |  SELECT lang, CAST(length(text) AS DOUBLE) AS v,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS w
        |  FROM documents
        |  WHERE lang IS NOT NULL AND text IS NOT NULL),
        |g AS (SELECT lang, v, SUM(w) AS w FROM d WHERE w > 0 GROUP BY lang, v),
        |c AS (SELECT lang, v, w,
        |  SUM(w) OVER (PARTITION BY lang ORDER BY v) AS cum FROM g),
        |t AS (SELECT lang, SUM(w) AS tw FROM g GROUP BY lang),
        |pr AS (SELECT * FROM (VALUES (0.5), (0.9)) AS p(prob)),
        |tt AS (SELECT t.lang, pr.prob,
        |  CAST(CEIL(pr.prob * t.tw) AS BIGINT) AS tgt, t.tw
        |  FROM t CROSS JOIN pr)
        |SELECT c.lang, tt.prob, MIN(c.v) AS value,
        |  CAST(MAX(tt.tw) AS BIGINT) AS total_weight
        |FROM c JOIN tt ON c.lang = tt.lang AND c.cum >= tt.tgt
        |GROUP BY c.lang, tt.prob
        |ORDER BY c.lang, tt.prob""".stripMargin,
    // cummax sweep: a window opens a merged range iff its start passes
    // the running max of prior ends; ties on (s, e) are order-immune
    "q111_interval_union" ->
      """WITH iv AS (
        |  SELECT l_suppkey AS k,
        |    datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS s,
        |    datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) + 6 AS e
        |  FROM lineitem WHERE l_suppkey IS NOT NULL AND l_shipdate IS NOT NULL),
        |o AS (
        |  SELECT k, s, e, MAX(e) OVER (PARTITION BY k ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        |g AS (
        |  SELECT k, s, e, SUM(CASE WHEN pmax IS NULL OR s > pmax
        |    THEN 1 ELSE 0 END) OVER (PARTITION BY k ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
        |  FROM o),
        |u AS (
        |  SELECT k, gid, MIN(s) AS us, MAX(e) AS ue, COUNT(*) AS n
        |  FROM g GROUP BY k, gid)
        |SELECT k AS l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_ranges,
        |  CAST(SUM(n) AS BIGINT) AS n_merged,
        |  CAST(SUM(ue - us + 1) AS BIGINT) AS covered_days
        |FROM u GROUP BY k ORDER BY l_suppkey""".stripMargin,
    // brute-force all-pairs oracle: the gate proves the Spark side's
    // prefix filter is COMPLETE (finds every qualifying pair), since the
    // two sides share only the Jaccard definition, not the algorithm
    "q113_set_similarity" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id,
        |      CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
        |           ELSE w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] END AS s
        |    FROM d, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS u(i)) t),
        |counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS m
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  CAST(m AS DOUBLE) / (ca.n + cb.n - m) AS jaccard
        |FROM inter
        |JOIN counts ca ON ca.doc_id = id_a
        |JOIN counts cb ON cb.doc_id = id_b
        |WHERE CAST(m AS DOUBLE) / (ca.n + cb.n - m) >= CAST(0.5 AS DOUBLE)
        |ORDER BY id_a, id_b""".stripMargin,
    // recursive-CTE replay of the integer EWMA recurrence; DuckDB's `//`
    // truncates toward zero exactly like Java long division (all terms
    // here are non-negative anyway — events.value > 0)
    "q114_ewma_chart" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, CAST(floor(value * 1e6) AS BIGINT) AS v,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS BIGINT) AS rn
        |  FROM events),
        |rec AS (
        |  SELECT user_id, rn, event_id, v, v AS ewma, CAST(0 AS BIGINT) AS dev,
        |    CAST(NULL AS BIGINT) AS resid, false AS is_spike
        |  FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT ev.user_id, ev.rn, ev.event_id, ev.v,
        |    (1 * ev.v + 3 * rec.ewma) // 4,
        |    (1 * abs(ev.v - rec.ewma) + 3 * rec.dev) // 4,
        |    ev.v - rec.ewma,
        |    rec.dev > 0 AND abs(ev.v - rec.ewma) > 3 * rec.dev
        |  FROM ev JOIN rec ON ev.user_id = rec.user_id AND ev.rn = rec.rn + 1)
        |SELECT user_id, rn, event_id, v, ewma, dev, resid, is_spike
        |FROM rec ORDER BY user_id, rn""".stripMargin,
    // brute-force triangle enumeration (a<b<c three-way join) vs the
    // Spark side's degree-ordered orientation — different algorithms,
    // same census
    "q115_triangles" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |pairs AS (
        |  SELECT a.p AS pa, b.p AS pb FROM op a JOIN op b
        |  ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING count(*) >= 2),
        |tri AS (
        |  SELECT ab.pa AS a, ab.pb AS b, bc.pb AS c
        |  FROM pairs ab JOIN pairs bc ON ab.pb = bc.pa
        |  JOIN pairs ac ON ac.pa = ab.pa AND ac.pb = bc.pb),
        |nodes AS (SELECT pa AS p FROM pairs UNION ALL SELECT pb FROM pairs),
        |deg AS (SELECT p, CAST(count(*) AS BIGINT) AS d FROM nodes GROUP BY 1),
        |tn AS (SELECT p, CAST(count(*) AS BIGINT) AS t FROM (
        |  SELECT a AS p FROM tri UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri) GROUP BY 1)
        |SELECT deg.p AS part, deg.d AS degree,
        |  coalesce(tn.t, 0) AS triangles,
        |  CASE WHEN deg.d >= 2
        |    THEN CAST(2 * coalesce(tn.t, 0) AS DOUBLE)
        |      / CAST(deg.d * (deg.d - 1) AS DOUBLE)
        |    ELSE CAST(0.0 AS DOUBLE) END AS clustering
        |FROM deg LEFT JOIN tn ON tn.p = deg.p
        |ORDER BY part""".stripMargin
  )

  /** standalone-stopword hit total for the quality-score oracle (same
    * length-difference trick as langIdSql). */
  private def qHits(words: Seq[String]): String =
    words.map { w =>
      s"CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' $w ', ' '))) / ${w.length + 1} AS BIGINT)"
    }.mkString(" + ")

  /** q30 oracle: K11/K12 classification semantics in DuckDB SQL for the
    * synthesized URL shapes (`https://www.<source>.com/page/<id>` and
    * `https://news.example.com/a/<id>`). Expressed at the SEMANTIC level —
    * hostname derivation, company-domain suffix match, brand-token-in-host,
    * finance term/ticker regexes (both RE2-safe), finance source domains —
    * not as a precomputed answer; path-based branches (social post/profile
    * slugs) cannot fire for these paths and are noted, not encoded. */
  private lazy val controlOracleSql: String = {
    import graft.functions.{NarrativeRules => NR, RiskRules => RR}
    val financeList = RR.FinanceSources.toSeq.sorted.map(d => s"'$d'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id, source, text,
       |    CASE WHEN doc_id % 2 = 0 THEN lower(source) || '.com'
       |         ELSE 'news.example.com' END AS host
       |  FROM documents),
       |cls AS (
       |  SELECT source,
       |    -- classify_control: publisher null; paths /page/<id> and /a/<id>
       |    -- can never hit the social post/profile/path-keyword branches,
       |    -- so control reduces to company-domain match + brand-token-in-host
       |    (host = lower(source) || '.com'
       |      OR ends_with(host, '.' || lower(source) || '.com')
       |      OR len(list_filter(
       |           string_split(host, '.')[1:-2],
       |           x -> regexp_replace(x, '[^a-z0-9]', '', 'g') =
       |                regexp_replace(lower(source), '[^a-z0-9]', '', 'g')
       |                AND regexp_replace(lower(source), '[^a-z0-9]', '', 'g') <> ''))
       |         > 0) AS controlled,
       |    (regexp_matches(text, '${NR.sqlPattern(RR.FinanceTermsRe)}')
       |      OR regexp_matches(text, '${RR.TickerRe.pattern()}')
       |      OR len(list_filter($financeList,
       |           d -> host = d OR ends_with(host, '.' || d))) > 0) AS finance
       |  FROM t)
       |SELECT source,
       |  CAST(SUM(CASE WHEN controlled THEN 1 ELSE 0 END) AS BIGINT) AS controlled_cnt,
       |  CAST(SUM(CASE WHEN finance THEN 1 ELSE 0 END) AS BIGINT) AS finance_cnt,
       |  CAST(COUNT(*) AS BIGINT) AS n
       |FROM cls GROUP BY source ORDER BY source""".stripMargin
  }

  /** q29 oracle: the FULL narrative kernel (K1/K2/K3) in DuckDB SQL,
    * generated from the same compiled pattern constants the Scala kernel
    * uses ([[graft.functions.NarrativeRules]]) — possible because the whole
    * battery is RE2-compatible. Classification CASE mirrors the battery's
    * fixed decision order; the rollup mirrors NarrativeRollup (gate,
    * histogram tie-break, Other fallback); tags/tag_counts are built as the
    * same JSON strings Spark's to_json emits. */
  private lazy val narrativeOracleSql: String = {
    import graft.functions.{NarrativeRules => NR}
    def re(hay: String, p: java.util.regex.Pattern): String =
      s"regexp_matches($hay, '${NR.sqlPattern(p)}')"
    // classify haystack: Seq(title, snippet, source, url).mkString(" ").trim
    // with snippet = url = '' -> two spaces between title and source
    val hay = "trim(title || '  ' || source)"
    // low-priority haystack filters empty components -> single space
    val lpHay = "trim(title || ' ' || source)"

    val lp = Seq(
      s"(${re(lpHay, NR.LowPriorityTariffContextRe)} AND ${re(lpHay, NR.LowPriorityTariffLegalRe)}" +
        s" AND NOT ${re(lpHay, NR.LowPriorityTariffBlockerRe)} AND NOT ${re(lpHay, NR.LowPriorityCrisisBlockerRe)})",
      s"(${re(lpHay, NR.WorkforceRe)} AND NOT ${re(lpHay, NR.LowPriorityCrisisBlockerRe)}" +
        s" AND NOT ${re(lpHay, NR.LowPriorityLegalEnforcementRe)})",
      s"(${re(lpHay, NR.LowPriorityDelayActionRe)} AND ${re(lpHay, NR.LowPriorityDelayContextRe)}" +
        s" AND NOT ${re(lpHay, NR.LowPriorityDelayBlockerRe)} AND NOT ${re(lpHay, NR.LowPriorityCrisisBlockerRe)})",
      s"(${re(lpHay, NR.LowPriorityFeeActionRe)} AND ${re(lpHay, NR.LowPriorityFeeContextRe)}" +
        s" AND NOT ${re(lpHay, NR.LowPriorityCrisisBlockerRe)})",
      s"(${re(lpHay, NR.LowPriorityDebtActionRe)} AND ${re(lpHay, NR.LowPriorityDebtContextRe)}" +
        s" AND NOT ${re(lpHay, NR.LowPriorityDebtBlockerRe)} AND NOT ${re(lpHay, NR.LowPriorityCrisisBlockerRe)})",
      s"(${re(lpHay, NR.LowPriorityStoreActionRe)} AND ${re(lpHay, NR.LowPriorityStoreContextRe)}" +
        s" AND NOT ${re(lpHay, NR.LowPriorityCrisisBlockerRe)} AND NOT ${re(lpHay, NR.LowPriorityLegalEnforcementRe)})"
    ).mkString("(", " OR ", ")")

    // fixed decision order: crisis battery first (first hit is primary),
    // then non-crisis — matches classifyNarrativeTags
    val battery: Seq[(String, String)] = Seq(
      re(hay, NR.FraudRe) -> "Fraud",
      re(hay, NR.DataBreachRe) -> "Data Breaches",
      s"(${re(hay, NR.CeoDepartRe)} AND NOT ${re(hay, NR.CeoDepartExcludeRe)})" ->
        "CEO Departures (firings, resignations)",
      re(hay, NR.WorkforceRe) -> "Workforce Reductions",
      re(hay, NR.LaborRe) -> "Labor Disputes",
      re(hay, NR.AccidentRe) -> "Accidents & Disasters",
      re(hay, NR.ActivistInvestorRe) -> "Activist Investor Interest",
      re(hay, NR.UnforcedRe) -> "Unforced Errors",
      re(hay, NR.LegalRe) -> "Legal & Regulatory",
      re(hay, NR.RebrandingRe) -> "Rebranding",
      re(hay, NR.MnaRe) -> "Mergers and acquisitions",
      s"(${re(hay, NR.PlannedExecRe)} AND NOT ${re(hay, NR.PlannedExecExcludeRe)})" ->
        "Planned Executive Turnover")
    val primaryCase = "CASE WHEN NOT cand THEN NULL WHEN " + lp + " THEN NULL " +
      battery.map { case (cond, tag) => s"WHEN $cond THEN '$tag'" }.mkString(" ") +
      " ELSE NULL END"

    def inList(ts: Seq[String]) = ts.map(t => s"'$t'").mkString("(", ", ", ")")
    val groupRankCase = s"CASE WHEN tag IN ${inList(NR.CrisisTags)} THEN 0 " +
      s"WHEN tag IN ${inList(NR.NonCrisisTags)} THEN 1 ELSE 2 END"
    val tagOrderCase = "CASE " + NR.TagOrder.toSeq.sortBy(_._2)
      .map { case (t, i) => s"WHEN tag = '$t' THEN $i" }.mkString(" ") + " ELSE 999 END"

    s"""WITH items AS (
       |  SELECT source, text AS title,
       |    CASE WHEN doc_id % 3 = 0 THEN 'negative'
       |         WHEN doc_id % 3 = 1 THEN 'neutral' ELSE 'positive' END AS sentiment,
       |    (doc_id % 7 = 0) AS finance_routine
       |  FROM documents),
       |cls AS (
       |  SELECT source,
       |    (sentiment = 'negative' AND NOT finance_routine) AS cand,
       |    CASE WHEN (sentiment = 'negative' AND NOT finance_routine)
       |         THEN $primaryCase END AS tag
       |  FROM items),
       |agg AS (
       |  SELECT source,
       |    CAST(SUM(CASE WHEN cand THEN 1 ELSE 0 END) AS BIGINT) AS negative_item_count,
       |    CAST(SUM(CASE WHEN cand AND tag IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS tagged0,
       |    CAST(SUM(CASE WHEN cand AND tag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unmatched0
       |  FROM cls GROUP BY source),
       |histo AS (
       |  SELECT source, tag, CAST(COUNT(*) AS BIGINT) AS cnt,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY COUNT(*) DESC, $groupRankCase, $tagOrderCase, lower(tag)) AS rn
       |  FROM cls WHERE cand AND tag IS NOT NULL GROUP BY source, tag),
       |hsum AS (
       |  SELECT source,
       |    max(CASE WHEN rn = 1 THEN tag END) AS hp,
       |    max(CASE WHEN rn = 1 THEN cnt END) AS hpc,
       |    coalesce('[' || string_agg('"' || tag || '"', ',' ORDER BY rn) || ']', '[]') AS tags_json,
       |    coalesce('{' || string_agg('"' || tag || '":' || cnt, ',' ORDER BY rn) || '}', '{}') AS counts_json
       |  FROM histo GROUP BY source),
       |joined AS (
       |  SELECT a.source, a.negative_item_count, a.tagged0, a.unmatched0,
       |    a.negative_item_count >= ${NR.MinNegTopStories} AS gate_met,
       |    h.hp, h.hpc, coalesce(h.tags_json, '[]') AS tags_json,
       |    coalesce(h.counts_json, '{}') AS counts_json
       |  FROM agg a LEFT JOIN hsum h ON a.source = h.source),
       |named AS (
       |  SELECT *,
       |    CASE WHEN NOT gate_met THEN NULL
       |         WHEN hp IS NOT NULL THEN hp
       |         WHEN unmatched0 >= ${NR.OtherMinSupport} THEN 'Other' END AS primary_tag
       |  FROM joined)
       |SELECT source, negative_item_count,
       |  CASE WHEN gate_met THEN tagged0 ELSE 0 END AS tagged_item_count,
       |  CASE WHEN gate_met THEN unmatched0 ELSE negative_item_count END AS unmatched_negative_items,
       |  gate_met, primary_tag,
       |  CASE WHEN primary_tag IS NULL THEN NULL
       |       WHEN primary_tag IN ${inList(NR.CrisisTags)} THEN 'crisis'
       |       ELSE 'non_crisis' END AS primary_group,
       |  CASE WHEN primary_tag IS NULL THEN NULL
       |       ELSE primary_tag IN ${inList(NR.CrisisTags)} END AS is_crisis,
       |  CASE WHEN NOT gate_met THEN 0
       |       WHEN hp IS NOT NULL THEN hpc
       |       WHEN primary_tag = 'Other' THEN unmatched0
       |       ELSE 0 END AS supporting_negative_items,
       |  CASE WHEN NOT gate_met THEN '[]'
       |       WHEN tags_json <> '[]' THEN tags_json
       |       WHEN primary_tag = 'Other' THEN '["Other"]'
       |       ELSE '[]' END AS tags,
       |  CASE WHEN gate_met THEN counts_json ELSE '{}' END AS tag_counts,
       |  '${NR.RuleVersion}' AS rule_version
       |FROM named ORDER BY source""".stripMargin
  }
}
