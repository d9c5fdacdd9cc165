package graft.operators

import org.apache.spark.sql.DataFrame
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
}
