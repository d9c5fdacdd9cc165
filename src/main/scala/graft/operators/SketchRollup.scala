package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch pre-aggregation — the incremental distinct-count
  * pattern for 100 TB fact tables (reference A16 `count(DISTINCT user)`
  * rollups, e.g. daily active users re-read per dashboard load).
  *
  * The exact rollup (`q35_distinct_users`) re-scans the fact table for
  * every grain and every refresh. This operator pre-aggregates each fine
  * partition (day) ONCE into a Datasketches HLL sketch column; every
  * coarser grain — week, month, all-time, late-arriving-partition repair —
  * is a `hll_union_agg` over the TINY sketch table. The union is
  * associative, commutative and idempotent-on-registers, so:
  *  - a new day folds into existing rollups without touching history;
  *  - merged-path estimates are IDENTICAL (not just close) to a direct
  *    sketch over the union of the raw inputs — HLL registers are
  *    order-free maxima (pinned in the spec). One caveat, pinned in the
  *    streaming spec: repeated state-level re-merging (e.g. streaming
  *    micro-batch state) can promote sparse sketches to dense mode
  *    earlier than a one-shot aggregation, shifting estimates within the
  *    HLL envelope — row counts still merge exactly;
  *  - the fact table is read exactly once per partition, ever.
  *
  * Estimates are within the standard HLL envelope (~1.6% at the default
  * lgConfigK=12; the spec pins 5% against the exact count). Driver-oracle
  * note: DuckDB cannot replay Datasketches registers, so this family is
  * spec-pinned (like streaming) rather than SQL-oracled; the EXACT twin
  * queries (q35, two-level hash agg) remain the oracle-matched path.
  */
object SketchRollup {

  /** One HLL sketch + exact row count per (grain) group. Run once per new
    * fine-grain partition; the output is the only thing coarser rollups
    * ever read. `binary` sketch column, ~2^lgK bytes per group. */
  def sketchByKey(
      facts: DataFrame,
      grainCols: Seq[String],
      keyCol: String,
      lgConfigK: Int = 12): DataFrame =
    facts.groupBy(grainCols.map(col): _*)
      .agg(
        hll_sketch_agg(col(keyCol), lgConfigK).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Merge fine-grain sketches up to a coarser grain: distinct-count
    * estimates plus the (exactly additive) row counts. Touches only the
    * sketch table — never the facts. */
  def rollup(
      sketches: DataFrame,
      coarseCols: Seq[String]): DataFrame =
    sketches.groupBy(coarseCols.map(col): _*)
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct"),
        sum(col("n_rows")).as("n_rows"))

  /** Quantile twin ([[graft.functions.KllSketch]]): one mergeable KLL
    * sketch + exact row count per fine-grain group — run once per new
    * partition; every later percentile question reads only the sketch
    * table. `qsketch` is the compact byte image (~KB at k=200). */
  def quantileSketchByKey(
      facts: DataFrame,
      grainCols: Seq[String],
      valueCol: String,
      k: Int = 200): DataFrame =
    facts.groupBy(grainCols.map(col): _*)
      .agg(
        udaf(graft.functions.KllSketch.KllBuildAgg(k))
          .apply(col(valueCol).cast("double")).as("qsketch"),
        count(col(valueCol)).as("n_rows"))

  /** Merge quantile sketches to a coarser grain and evaluate `probs`:
    * `approx_q` is the quantile array (one per prob, KLL rank-error
    * envelope), `n_rows` exactly additive. Facts never re-read. */
  def quantileRollup(
      sketches: DataFrame,
      coarseCols: Seq[String],
      probs: Seq[Double],
      k: Int = 200): DataFrame =
    sketches.groupBy(coarseCols.map(col): _*)
      .agg(
        udaf(graft.functions.KllSketch.KllQuantilesAgg(k, probs))
          .apply(col("qsketch")).as("approx_q"),
        sum(col("n_rows")).as("n_rows"))

  /** Frequency twin ([[graft.functions.CmsSketch]]): one mergeable
    * count-min sketch + exact row count per fine-grain group. Unlike the
    * HLL member this is NOT replay-idempotent (counters add) — fold each
    * partition exactly once. */
  def freqSketchByKey(
      facts: DataFrame,
      grainCols: Seq[String],
      keyCol: String,
      depth: Int = 5,
      width: Int = 4096,
      seed: Int = 42): DataFrame =
    facts.groupBy(grainCols.map(col): _*)
      .agg(
        udaf(graft.functions.CmsSketch.CmsBuildAgg(depth, width, seed))
          .apply(col(keyCol).cast("string")).as("fsketch"),
        count(col(keyCol)).as("n_rows"))

  /** Merge frequency sketches to a coarser grain and estimate each probe
    * item's count (`approx_counts` aligned with `items`; never an
    * undercount, overcount within eps·N). All sketches must share
    * (depth, width, seed). Facts never re-read. */
  def freqRollup(
      sketches: DataFrame,
      coarseCols: Seq[String],
      items: Seq[String],
      depth: Int = 5,
      width: Int = 4096,
      seed: Int = 42): DataFrame =
    sketches.groupBy(coarseCols.map(col): _*)
      .agg(
        udaf(graft.functions.CmsSketch.CmsEstimateAgg(depth, width, seed, items))
          .apply(col("fsketch")).as("approx_counts"),
        sum(col("n_rows")).as("n_rows"))
}
