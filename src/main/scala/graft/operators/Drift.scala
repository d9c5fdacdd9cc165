package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift audits for corpus governance: is one source's (or
  * one snapshot's) data shaped like the rest of the corpus? Both
  * statistics here are EXACT integer computations — ppm shares and
  * total-variation distance instead of PSI/KL (whose `ln` terms would put
  * engine-specific transcendental rounding into the artifact) — so any
  * engine replays them bit-for-bit, and a drift alert is attributable to
  * data, never to float noise.
  */
object Drift {

  /** Total-variation drift of each source's value distribution vs the
    * pooled corpus, over exact global decile bins.
    *
    * Bins: NTILE(nBins) over (value, id) — [[Batching.groupedNtile]] with
    * a constant key, i.e. the exact ntile any SQL engine computes, ties
    * broken by id. Shares: per-source bin shares in ppm (floor). TV =
    * Σ_bins |share_s − share_pool| / 2 — in ppm, integer throughout.
    * TV ∈ [0, 1e6]; 0 = identical histograms.
    *
    * Scale shape: the ntile runs at the distinct-value grain (one
    * map-side-combined shuffle + a broadcast offsets join — never a
    * corpus-grain global sort); the share rollup is two tiny aggregates
    * on the (source, bin) grain (≤ |sources|·nBins rows).
    *
    * Returns (source, n_docs, tv_ppm) one row per source.
    */
  def tvDriftBySource(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      valCol: String,
      nBins: Int = 10): DataFrame = {
    val binned = Batching.groupedNtile(
      docs.select(col(idCol), col(sourceCol), col(valCol))
        .withColumn("__k", lit(1)),
      keyCols = Seq("__k"), valCol = valCol, idCol = idCol,
      n = nBins, outCol = "__bin")
    val cells = binned.groupBy(col(sourceCol), col("__bin"))
      .agg(count(lit(1)).as("__n"))
    // dense (source × bin) grid: a bin a source never hits still
    // contributes |0 − pool_share| to TV; both sides are dimension-sized,
    // the broadcast keeps the product off the exchange path
    val grid = cells.select(sourceCol).distinct()
      .crossJoin(broadcast(cells.select("__bin").distinct()))
    val dense = grid.join(cells, Seq(sourceCol, "__bin"), "left")
      .select(col(sourceCol), col("__bin"),
        coalesce(col("__n"), lit(0L)).as("__n"))
    val srcTot = dense.groupBy(col(sourceCol)).agg(sum(col("__n")).as("__st"))
    val binTot = dense.groupBy(col("__bin")).agg(sum(col("__n")).as("__bt"))
    val tot = dense.agg(sum(col("__n")).as("__tot"))
    def shPpm(n: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
      ((n * lit(1000000L) - pmod(n * lit(1000000L), d)) / d).cast("long")
    dense.join(broadcast(srcTot), Seq(sourceCol))
      .join(broadcast(binTot), Seq("__bin"))
      .crossJoin(broadcast(tot))
      .withColumn("__d",
        abs(shPpm(col("__n"), col("__st")) - shPpm(col("__bt"), col("__tot"))))
      .groupBy(col(sourceCol))
      .agg(max(col("__st")).as("n_docs"), sum(col("__d")).as("__sd"))
      .select(col(sourceCol).as("source"), col("n_docs"),
        ((col("__sd") - pmod(col("__sd"), lit(2L))) / lit(2L)).cast("long")
          .as("tv_ppm"))
  }

  /** N-gram novelty per epoch — how much genuinely new text each data
    * epoch contributes: for each epoch, the fraction (ppm, floor) of its
    * DISTINCT word n-grams whose FIRST corpus appearance is that epoch.
    * A freshness/staleness audit for rolling corpus snapshots: novelty
    * collapsing toward 0 means new crawls are recycling old text.
    *
    * Scale shape: the gram stream is a shuffle-free in-row explode; the
    * only corpus-scale exchange is the (gram → min-epoch, per-epoch
    * presence) rollup on the gram hash — map-side combined, distinct
    * grain; the per-epoch fold is |epochs|-sized.
    *
    * Returns (epoch, n_distinct, n_new, novelty_ppm).
    */
  def ngramNovelty(
      docs: DataFrame,
      epochCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    require(n >= 1, "need n >= 1")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val grams = docs.select(col(epochCol).cast("long").as("epoch"), toks.as("__t"))
      .filter(size(col("__t")) >= n)
      .select(col("epoch"),
        explode(sequence(lit(1), size(col("__t")) - (n - 1))).as("__p"), col("__t"))
      .select(col("epoch"),
        array_join(slice(col("__t"), col("__p"), lit(n)), " ").as("gram"))
    // (gram, epoch) distinct grain, then gram grain — both map-side combined
    val perEpochGram = grams.groupBy(col("gram"), col("epoch")).agg(count(lit(1)).as("__c"))
    val firstEpoch = perEpochGram.groupBy(col("gram"))
      .agg(min(col("epoch")).as("__first"))
    perEpochGram.join(firstEpoch, "gram")
      .groupBy(col("epoch"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(when(col("epoch") === col("__first"), 1L).otherwise(0L)).as("n_new"))
      .withColumn("novelty_ppm",
        ((col("n_new") * lit(1000000L) -
          pmod(col("n_new") * lit(1000000L), col("n_distinct"))) /
          col("n_distinct")).cast("long"))
  }

  /** Exact pairwise vocabulary Jaccard between sources — the corpus-level
    * similarity matrix (which feeds copy from each other at the VOCABULARY
    * level, complementing q136's document-level near-dup mass): for every
    * source pair, |Va ∩ Vb| and |Va ∪ Vb| over distinct lowercased word
    * sets, Jaccard in floor ppm.
    *
    * Scale shape: the corpus collapses to the (source, token) DISTINCT
    * grain first (one map-side-combined shuffle — the only corpus-sized
    * exchange); the pair harvest self-joins THAT grain on token, where a
    * token fans out to at most |sources| rows, so pair work is bounded by
    * |vocab|·C(|sources|,2) — vocabulary-scale, never corpus-scale.
    * Source sizes broadcast back for the union arithmetic.
    *
    * Returns (source_a, source_b, n_inter, n_union, jaccard_ppm),
    * source_a < source_b, pairs with empty intersections omitted. */
  def sourceVocabJaccard(
      docs: DataFrame,
      sourceCol: String,
      textCol: String): DataFrame = {
    def floorDiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("long")
    val st = docs
      .select(col(sourceCol).as("__src"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("__tok"))
      .groupBy("__src", "__tok").agg(count(lit(1)).as("__c"))
      .select("__src", "__tok")
    val sizes = st.groupBy(col("__src")).agg(count(lit(1)).as("__n"))
    val inter = st.toDF("__sa", "__tok")
      .join(st.toDF("__sb", "__tok2"),
        col("__tok") === col("__tok2") && col("__sa") < col("__sb"))
      .groupBy(col("__sa"), col("__sb"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.toDF("__sa", "__na")), "__sa")
      .join(broadcast(sizes.toDF("__sb", "__nb")), "__sb")
      .withColumn("n_union", col("__na") + col("__nb") - col("n_inter"))
      .select(col("__sa").as("source_a"), col("__sb").as("source_b"),
        col("n_inter"), col("n_union"),
        floorDiv(col("n_inter") * 1000000L, col("n_union")).as("jaccard_ppm"))
  }

  /** Exact two-sample Kolmogorov-Smirnov distance between two value
    * columns — the drift gate a monitoring pipeline runs between a new
    * crawl drop and a frozen baseline (streaming face:
    * [[graft.streaming.DriftStream]]). Same cross-multiplied integer sup
    * as [[ksAgainstPool]], on the union value grain:
    * D·ppm = ⌊10⁶ · max_v |cumA(v)·nB − cumB(v)·nA| / (nA·nB)⌋.
    *
    * Scale shape: each side collapses to its value grain (one map-side-
    * combined shuffle each); the union grain carries one cumulative
    * window — value-grain, not row-grain; for a single un-keyed
    * comparison that window is single-partition on the distinct-value
    * table (documented tiny grain, the q165 posture). Returns ONE row
    * (n_a, n_b, ks_ppm). */
  def ksTwoSample(a: DataFrame, b: DataFrame, valCol: String): DataFrame = {
    def grain(df: DataFrame) = df
      .groupBy(col(valCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    ksTwoSampleGrains(grain(a), grain(b))
  }

  /** [[ksTwoSample]] on pre-aggregated value-grain counts `(v, c)` — the
    * form a frozen baseline is STORED in (re-expanding counts back to
    * rows would be an executor-memory bomb; the statistic only ever
    * needed the grain). */
  def ksTwoSampleGrains(ga: DataFrame, gb: DataFrame): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def floorDiv(x: Column, y: Column): Column = (x - pmod(x, y)) / y
    val g = ga.select(col("v").as("__v"), col("c").as("__ca"))
      .join(gb.select(col("v").as("__v"), col("c").as("__cb")), Seq("__v"), "full")
      .na.fill(0L, Seq("__ca", "__cb"))
    // Two-level bucket carry (the q158/q204 kernel): value-grain prefix
    // sums WITHOUT a corpus-wide single-partition window. Buckets are
    // 4096 uniform slices of the observed [lo, hi] value range — floor of
    // an increasing affine map is monotone, so bucket order == value
    // order and equal values share a bucket; the carry window runs on the
    // <= 4096 bucket grain only (bounded domain, constant partition key).
    val bounds = g.agg(
      min(col("__v").cast("double")).as("__lo"),
      max(col("__v").cast("double")).as("__hi"),
      sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"))
    val g2 = g.crossJoin(broadcast(bounds))
      .withColumn("__b",
        when(col("__hi") <= col("__lo"), lit(0L))
          .otherwise(least(lit(4095L),
            floor((col("__v").cast("double") - col("__lo")) * 4096.0
              / (col("__hi") - col("__lo"))).cast("long"))))
    val wb = Window.partitionBy(lit(0)).orderBy("__b")
    val carries = g2.groupBy(col("__b"))
      .agg(sum(col("__ca")).as("__ba"), sum(col("__cb")).as("__bb"))
      .withColumn("__cra", coalesce(sum(col("__ba"))
        .over(wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__crb", coalesce(sum(col("__bb"))
        .over(wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__cra"), col("__crb"))
    val wi = Window.partitionBy("__b").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g2.join(broadcast(carries), "__b")
      .withColumn("__cuma", col("__cra") + sum(col("__ca")).over(wi))
      .withColumn("__cumb", col("__crb") + sum(col("__cb")).over(wi))
      .withColumn("__num",
        abs(dec(col("__cuma")) * dec(col("__nb")) -
          dec(col("__cumb")) * dec(col("__na"))))
      .agg(min(col("__na")).as("n_a"), min(col("__nb")).as("n_b"),
        max(col("__num")).as("__mx"))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          floorDiv(col("__mx") * lit(1000000), dec(col("n_a")) * dec(col("n_b")))
            .cast("long")).as("ks_ppm"))
  }

  /** Exact two-sample Kolmogorov-Smirnov distance of each key's value
    * distribution against the pooled corpus — the bin-free companion to
    * [[tvDriftBySource]] (TV quantizes into deciles; KS takes the sup of
    * the CDF gap at every distinct value, so a drift concentrated between
    * decile boundaries can't hide). Exact integers end-to-end by
    * cross-multiplication:
    *
    *   D = max_v |F_s(v) − F_pool(v)|
    *     = max_v |cum_s(v)·n_pool − cum_pool(v)·n_s| / (n_s·n_pool),
    *
    * the numerator in decimal(38,0) (cum·n reaches ~n² — past long at
    * ~3e9 rows), floor-ppm on the maximum. The sup over all real v is
    * attained at a pooled jump point, so scanning the pooled distinct
    * values is exact, not an approximation.
    *
    * Scale shape: one map-side-combined shuffle to the (key, value)
    * grain; the dense (value × key) evaluation grid is VALUE-grain ×
    * |keys| (the |keys|-row side broadcasts onto the value table — never
    * corpus-grain); per-key cumulative windows run on that grid, with the
    * pooled cumulative computed inside the SAME key-partitioned window
    * (each grid row carries the pooled per-value count), so no
    * single-partition global window exists anywhere. Totals attach via
    * one broadcast 1-row crossJoin (the q144/A8 pattern).
    *
    * Returns (keyCol, n, ks_ppm), n the key's row count. */
  def ksAgainstPool(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def floorDiv(a: Column, b: Column): Column = (a - pmod(a, b)) / b
    val kv = df
      .groupBy(col(keyCol).as("__k"), col(valCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val pooled = kv.groupBy("__v").agg(sum(col("__c")).as("__cp"))
    val keys = kv.groupBy("__k").agg(sum(col("__c")).as("__ns"))
    val nPool = pooled.agg(sum(col("__cp")).as("__np"))
    val grid = pooled
      .crossJoin(broadcast(keys))
      .join(kv, Seq("__k", "__v"), "left")
      .withColumn("__cs", coalesce(col("__c"), lit(0L)))
    val w = Window.partitionBy("__k").orderBy("__v")
    grid
      .withColumn("__cums", sum(col("__cs")).over(w))
      .withColumn("__cump", sum(col("__cp")).over(w))
      .crossJoin(broadcast(nPool))
      .withColumn("__num",
        abs(dec(col("__cums")) * dec(col("__np")) -
          dec(col("__cump")) * dec(col("__ns"))))
      .groupBy(col("__k"))
      .agg(min(col("__ns")).as("n"), min(col("__np")).as("__np2"),
        max(col("__num")).as("__maxnum"))
      .select(col("__k").as(keyCol), col("n"),
        floorDiv(col("__maxnum") * lit(1000000),
          dec(col("n")) * dec(col("__np2"))).cast("long").as("ks_ppm"))
  }
}
