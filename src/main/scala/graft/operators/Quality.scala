package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, Appendix A —
  * the standard pretraining filter battery): word-count bounds, mean
  * word length bounds, symbol-to-word ratio, alphabetic-word fraction,
  * and minimum stop-word evidence, composed into one `pass` verdict.
  *
  * Every metric is exact integer arithmetic divided once (the repo's
  * float-parity policy): counts come from length-difference tricks and
  * in-row list predicates, so any engine replays the ratios bit-for-bit
  * — no regex extraction ambiguity, no float accumulation. All pure
  * projections + one whitespace split per document; no shuffle at all
  * until a caller aggregates. */
object Quality {

  /** Occurrences of literal `sub` in `c` via the length/replace trick
    * (exactly the non-overlapping count both Spark and DuckDB replace
    * semantics produce). */
  private def litCount(c: Column, sub: String): Column =
    ((length(c) - length(replace(c, lit(sub), lit("")))) / sub.length).cast("long")

  /** Adds the metric and flag columns to `docs`:
    * `(n_words, mean_word_len, symbol_ratio, alpha_frac, stop_hits,
    * words_ok, word_len_ok, symbol_ok, alpha_ok, stop_ok, pass)`. */
  def gopherRules(
      docs: DataFrame,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2): DataFrame = {
    val t = col(textCol)
    val toks = split(trim(lower(t)), "\\s+")
    val stopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val padded = concat(lit(" "), array_join(toks, " "), lit(" "))
    val stopHits = stopwords
      .map(w => litCount(padded, s" $w "))
      .reduce(_ + _)
    docs
      .withColumn("n_words", size(toks).cast("long"))
      // sum of word lengths == chars of the joined words minus the joiners
      .withColumn("__charsum",
        (length(array_join(toks, "")) ).cast("long"))
      .withColumn("mean_word_len",
        col("__charsum").cast("double") / col("n_words"))
      .withColumn("symbol_ratio",
        (litCount(t, "#") + litCount(t, "...")).cast("double") / col("n_words"))
      .withColumn("alpha_frac",
        size(filter(toks, w => w.rlike("[a-z]"))).cast("double") / col("n_words"))
      .withColumn("stop_hits", stopHits)
      .withColumn("words_ok",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("word_len_ok",
        col("mean_word_len") >= minMeanWordLen && col("mean_word_len") <= maxMeanWordLen)
      .withColumn("symbol_ok", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("alpha_ok", col("alpha_frac") >= minAlphaFrac)
      .withColumn("stop_ok", col("stop_hits") >= minStopHits)
      .withColumn("pass",
        col("words_ok") && col("word_len_ok") && col("symbol_ok") &&
          col("alpha_ok") && col("stop_ok"))
      .drop("__charsum")
  }

  /** Per-group lexical-diversity profile — the corpus linguistics pass a
    * pretraining mixture report runs per source/domain: token volume,
    * vocabulary size (types), hapax legomena (frequency-1 types),
    * type-token ratio and hapax fraction. A collapsing TTR or hapax
    * share is the classic signature of templated/boilerplate mass inside
    * a source (Heaps-law flattening) — the distributional companion to
    * the row-local [[gopherRules]] gates.
    *
    * Scale shape: ONE map-side-combined aggregate to the (group, token)
    * grain — the stream shrinks to per-source vocabularies there — then
    * one aggregate to the group grain; no joins, no windows, no distinct
    * at the raw-token grain. Ratios are exact-long / exact-long single
    * IEEE divisions. */
  def lexicalProfile(
      docs: DataFrame,
      groupCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(groupCol).as("grp"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("__tok"))
      .groupBy("grp", "__tok")
      .agg(count(lit(1)).as("__c"))
      .groupBy("grp")
      .agg(
        sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr", col("n_types").cast("double") / col("n_tokens"))
      .withColumn("hapax_frac",
        col("n_hapax").cast("double") / col("n_types"))

  /** Simpson token-concentration index per group — the probability two
    * tokens drawn without replacement from the group are the SAME type:
    * Σ c(c−1) / (N(N−1)), the diversity twin of [[lexicalProfile]]'s TTR
    * (entropy without the engine-specific `ln`). High concentration =
    * template/boilerplate-heavy source; near-uniform text sits close to
    * 1/n_types.
    *
    * Reported as exact integers (n_tokens, n_types, repeat_pairs) plus a
    * floor-ppm ratio. The ppm arithmetic runs in decimal(38,0): at corpus
    * scale N(N−1)·1e6 overflows a long (N ≥ ~3e6 tokens per group), and
    * this operator's whole point is surviving the 100 TB group. DuckDB
    * replays it in HUGEINT.
    *
    * Scale shape: identical to lexicalProfile — (group, token) grain then
    * group grain, both map-side-combined; no joins, no windows. */
  def simpsonConcentration(
      docs: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def floorDiv(a: Column, b: Column): Column = (a - pmod(a, b)) / b
    docs
      .select(col(groupCol).as("grp"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("__tok"))
      .groupBy("grp", "__tok")
      .agg(count(lit(1)).as("__c"))
      .groupBy("grp")
      .agg(
        sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("__c") * (col("__c") - 1L)).as("repeat_pairs"))
      .withColumn("simpson_ppm",
        floorDiv(dec(col("repeat_pairs")) * lit(1000000),
          greatest(dec(col("n_tokens")) * dec(col("n_tokens") - 1L), dec(lit(1))))
          .cast("long"))
  }

  /** Zipf head/middle/tail vocabulary segmentation — which slice of the
    * vocabulary carries the token mass: walking frequency levels from the
    * most frequent down, `head` = levels whose PRECEDING cumulative mass
    * is < 50% of all tokens, `middle` = < 90%, `tail` = the rest (a whole
    * frequency level lands in one segment — terms tied in frequency are
    * indistinguishable, so no within-level split). The tokenizer/vocab
    * sizing view: head terms are stopword-like (candidate subword fodder),
    * the tail is the hapax mass a vocab cap drops.
    *
    * Scale shape: corpus → term grain (one map-side-combined shuffle) →
    * FREQUENCY-OF-FREQUENCY grain (c, n_terms) — bounded by the number of
    * distinct frequency VALUES (≪ vocab; Zipf packs the tail into few
    * levels). The cumulative window runs on that tiny grain (documented
    * single-partition window, like the q158 bucket carry); thresholds are
    * integer cross-multiplications (2·prev < M, 10·prev < 9·M), decimal
    * (38,0) against corpus-scale token counts.
    *
    * Returns (segment, n_levels, n_terms, mass, mass_ppm, min_freq,
    * max_freq), one row per non-empty segment. */
  def zipfSegments(docs: DataFrame, textCol: String): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def floorDiv(a: Column, b: Column): Column = (a - pmod(a, b)) / b
    val terms = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("__tok"))
      .groupBy("__tok").agg(count(lit(1)).as("__c"))
    val ff = terms.groupBy(col("__c")).agg(count(lit(1)).as("__nt"))
      .withColumn("__mass", col("__c") * col("__nt"))
    val w = Window.partitionBy(lit(0)).orderBy(col("__c").desc)
    ff
      .withColumn("__prev",
        coalesce(sum(dec(col("__mass")))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), dec(lit(0))))
      .withColumn("__m", sum(dec(col("__mass"))).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("segment",
        when(dec(lit(2)) * col("__prev") < col("__m"), "1_head")
          .when(dec(lit(10)) * col("__prev") < dec(lit(9)) * col("__m"), "2_middle")
          .otherwise("3_tail"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_levels"),
        sum(col("__nt")).as("n_terms"),
        sum(col("__mass")).as("mass"),
        floorDiv(sum(dec(col("__mass"))) * lit(1000000),
          max(col("__m"))).cast("long").as("mass_ppm"),
        min(col("__c")).as("min_freq"),
        max(col("__c")).as("max_freq"))
  }
}
