package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Data-quality profiling — the pre-training corpus/table health check
  * (null rates, cardinalities, ranges, exact medians).
  *
  * Reference analogue: the ingest sanity checks scattered through
  * `src/ingest_v2.py` (row counts, empty-field guards) — generalized to a
  * declarative multi-column profile.
  *
  * 100 TB posture (exact mode): the naive one-`agg` formulation (N exact
  * `countDistinct` + N exact `percentile` in one aggregate) plans through
  * Expand (N+1 copies of every scanned row) and buffers EVERY value of
  * every column in aggregation buffers that merge on one final reducer — a
  * guaranteed OOM at corpus scale. This implementation instead:
  *
  *  1. melts the N columns into `(col_name, value)` rows with `stack`
  *     (one scan, no Expand, codegen'd);
  *  2. pre-aggregates to the DISTINCT-VALUE grain `(col_name, value) →
  *     cnt` — ONE map-side-combined shuffle, the only corpus-sized
  *     movement in the whole profile;
  *  3. reads n / n_null / n_distinct / min / max off that grain with a
  *     tiny second aggregate (n_distinct is a plain `count`, exact, no
  *     Expand);
  *  4. finds each exact median by iterative bucket refinement over the
  *     (persisted) distinct-value grain — the two-pass count+offset
  *     selection algorithm: each round buckets the current bracket into
  *     [[Buckets]] ranges, counts them (a B-row collect), and narrows to
  *     the <=2 adjacent buckets containing the target ranks, shrinking the
  *     bracket geometrically; when <= [[FinalizeDistinct]] distinct values
  *     remain the exact order statistics are resolved from one bounded
  *     collect. No executor ever buffers more than its share of the
  *     distinct-value grain; the driver never holds more than
  *     max(B·N, FinalizeDistinct) tiny rows.
  *
  * The result is numerically identical to exact `percentile` /
  * Python `statistics.median` / DuckDB `median` (same order statistics,
  * same `lower + (higher-lower)·0.5` interpolation) — and the whole
  * profile is a handful of small jobs over one shuffled pass of the data.
  *
  * `exact = false` swaps in the sketch mode: one lazy aggregation pass
  * with `approx_count_distinct` (HLL++) and `percentile_approx` — no
  * Expand, bounded buffers, for interactive profiling where estimates
  * suffice.
  */
object Profiling {

  /** Buckets per refinement round (each round shrinks the median bracket
    * by ~this factor; 4096 resolves a 600k-distinct column in one round). */
  val Buckets = 4096

  /** Distinct-value count below which the bracket is resolved exactly via
    * a single driver-side collect of the (value, cnt) tail. */
  val FinalizeDistinct = 65536

  /** Refinement-round cap. Linear bucketing shrinks the bracket width by
    * ~Buckets× per round, so even pathological double ranges (1e-300 ..
    * 1e300) converge within ~170 rounds; each round is one tiny job over
    * the persisted distinct-value grain. Past the cap the bracket is
    * force-finalized (correct, but may collect more than
    * [[FinalizeDistinct]] rows). */
  val MaxRounds = 256

  /** Profile numeric columns: (col_name, n, n_null, n_distinct, min_value,
    * max_value, median) — one row per column. Exact mode is scale-safe
    * (see object scaladoc) and runs its jobs eagerly, returning the
    * materialized per-column rows. */
  def profileNumeric(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    if (exact) profileExact(df, cols) else profileApprox(df, cols)
  }

  /** Exact medians per group for a single value column — the reusable
    * two-pass count+offset selection kernel (A12 at scale: exact
    * `statistics.median` parity without buffering a group's values in one
    * aggregation buffer). Returns a small materialized DataFrame
    * `(keyCol, median)`, one row per distinct non-null key. String keys.
    *
    * Intended for LOW-CARDINALITY key sets (the reference's A12 medians
    * group by enums): driver memory for the finalize step is bounded by
    * keys × [[FinalizeDistinct]] tiny rows. For millions of groups use a
    * per-key cumulative window over the distinct-value grain instead
    * (bounded by per-key distinct values) or `percentile_approx`. */
  def exactMedianByKey(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val grouped = df
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("__k"), col(valueCol).cast("double").as("__v"))
      .groupBy("__k", "__v").agg(count(lit(1)).as("__cnt"))
      .persist()
    try {
      val ns = grouped.filter(col("__v").isNotNull)
        .groupBy("__k")
        .agg(sum(col("__cnt")).as("n"), count(lit(1)).as("d"),
          min(col("__v")).as("mn"), max(col("__v")).as("mx"))
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
      val med = medians(grouped, ns)
      val rows = ns.keys.toSeq.sorted.map(k => Row(k, med(k).map(Double.box).orNull))
      spark.createDataFrame(rows.asJava,
        StructType(Seq(StructField(keyCol, StringType), StructField("median", DoubleType))))
    } finally grouped.unpersist(blocking = false)
  }

  /** Exact per-group quantiles at arbitrary probabilities — the same
    * selection kernel with R-7 interpolation (`pos = p*(n-1)`, linear
    * between the straddling order statistics: what `percentile`, DuckDB
    * `quantile_cont`, and numpy default to). Returns a small materialized
    * `(keyCol, prob, value)` DataFrame; one refinement loop per prob over
    * one shared distinct-value grain. Same low-key-cardinality contract as
    * [[exactMedianByKey]]. */
  def exactQuantilesByKey(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      "probs must be in [0, 1]")
    val spark = df.sparkSession
    val grouped = df
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("__k"), col(valueCol).cast("double").as("__v"))
      .groupBy("__k", "__v").agg(count(lit(1)).as("__cnt"))
      .persist()
    try {
      val ns = grouped.filter(col("__v").isNotNull)
        .groupBy("__k")
        .agg(sum(col("__cnt")).as("n"), count(lit(1)).as("d"),
          min(col("__v")).as("mn"), max(col("__v")).as("mx"))
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
      val rows = for {
        p <- probs
        qs = quantiles(grouped, ns, p)
        k <- ns.keys.toSeq.sorted
      } yield Row(k, p, qs(k).map(Double.box).orNull)
      spark.createDataFrame(rows.asJava,
        StructType(Seq(StructField(keyCol, StringType),
          StructField("prob", DoubleType), StructField("value", DoubleType))))
    } finally grouped.unpersist(blocking = false)
  }

  /** Exact WEIGHTED per-key quantiles, fully distributed: the lower
    * weighted quantile — the smallest value whose cumulative weight
    * reaches `ceil(p·W)` — computed on the distinct-value grain with a
    * per-key cumulative window. Integer weight arithmetic end-to-end, so
    * any engine replays it exactly (no interpolation, no float sums).
    *
    * This IS the "millions of groups" path the driver-finalized kernel
    * ([[exactMedianByKey]]) scaladoc points to: no driver selection loop,
    * state bounded by per-key DISTINCT values, nothing collected. The
    * pretraining use is token-weighted distributions (a 100-token doc
    * should count 100×, not 1×, when sizing context budgets).
    * Output: `(keyCol, prob, value, total_weight)`. */
  def weightedQuantilesByKey(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      weightCol: String,
      probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
      "probs must be in (0, 1]")
    require(!df.columns.exists(c => c.startsWith("__wq_")),
      "input must not contain reserved internal columns __wq_*")
    val spark = df.sparkSession
    import spark.implicits._
    val g = df
      .where(col(keyCol).isNotNull && col(valueCol).isNotNull &&
        col(weightCol).isNotNull && col(weightCol) > 0)
      .groupBy(col(keyCol).as("__wq_k"), col(valueCol).cast("double").as("__wq_v"))
      .agg(sum(col(weightCol).cast("long")).as("__wq_w"))
    val win = Window.partitionBy("__wq_k").orderBy("__wq_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g.withColumn("__wq_cum", sum(col("__wq_w")).over(win))
    val targets = g.groupBy("__wq_k").agg(sum(col("__wq_w")).as("__wq_tw"))
      .crossJoin(broadcast(probs.toDF("prob")))
      .withColumn("__wq_t", ceil(col("prob") * col("__wq_tw")).cast("long"))
    cum.join(targets, Seq("__wq_k"))
      .where(col("__wq_cum") >= col("__wq_t"))
      .groupBy(col("__wq_k"), col("prob"))
      .agg(min(col("__wq_v")).as("value"), max(col("__wq_tw")).as("total_weight"))
      .select(col("__wq_k").as(keyCol), col("prob"), col("value"), col("total_weight"))
  }

  /** The melted distinct-value grain `(col_name, value) -> cnt` — exposed
    * for plan audits (this is the ONLY corpus-sized shuffle in the exact
    * profile). */
  private[graft] def meltedGrouped(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stackArgs = cols.map(c => s"'$c', CAST(`$c` AS DOUBLE)").mkString(", ")
    df.select(expr(s"stack(${cols.size}, $stackArgs) AS (__k, __v)"))
      .groupBy("__k", "__v").agg(count(lit(1)).as("__cnt"))
  }

  private def profileExact(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val grouped = meltedGrouped(df, cols).persist()
    try {
      // n / n_null / n_distinct / min / max off the distinct-value grain:
      // 4 rows out, exact cardinality as a plain count — no Expand anywhere
      val stats = grouped.groupBy("__k").agg(
        coalesce(sum(when(col("__v").isNotNull, col("__cnt"))), lit(0L)).as("n"),
        coalesce(sum(when(col("__v").isNull, col("__cnt"))), lit(0L)).as("n_null"),
        count(when(col("__v").isNotNull, lit(1))).as("n_distinct"),
        min(col("__v")).as("mn"),
        max(col("__v")).as("mx"))
        .collect()
        .map(r => r.getString(0) -> r).toMap
      val ns = stats.map { case (k, r) =>
        k -> ((r.getLong(1), r.getLong(3),
          if (r.isNullAt(4)) 0.0 else r.getDouble(4),
          if (r.isNullAt(5)) 0.0 else r.getDouble(5)))
      }
      val med = medians(grouped, ns)
      val rows = cols.map { c =>
        val r = stats(c)
        Row(c, r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else Double.box(r.getDouble(4)),
          if (r.isNullAt(5)) null else Double.box(r.getDouble(5)),
          med(c).map(Double.box).orNull)
      }
      spark.createDataFrame(rows.asJava, profileSchema)
    } finally grouped.unpersist(blocking = false)
  }

  private val profileSchema = StructType(Seq(
    StructField("col_name", StringType),
    StructField("n", LongType),
    StructField("n_null", LongType),
    StructField("n_distinct", LongType),
    StructField("min_value", DoubleType),
    StructField("max_value", DoubleType),
    StructField("median", DoubleType)))

  /** Per-key refinement state: the target order statistics r1 <= r2 lie
    * inside the value bracket [lo, hi]; `offset` values sort strictly
    * below `lo`; `distinct` distinct values remain in the bracket; `frac`
    * interpolates between the two straddling order statistics. */
  private case class Bracket(
      lo: Double, hi: Double, offset: Long, distinct: Long,
      r1: Long, r2: Long, frac: Double)

  /** Exact weighted medians (`quantiles` at p = 0.5). */
  private def medians(
      grouped: DataFrame,
      ns: Map[String, (Long, Long, Double, Double)]): Map[String, Option[Double]] =
    quantiles(grouped, ns, 0.5)

  /** Exact weighted p-quantile for every key of a `(__k, __v, __cnt)`
    * distinct-value grain (persisted by the caller). `ns` maps key ->
    * (non-null count, distinct count, min, max) — all read off the caller's
    * stats aggregate so seeding costs no extra job. R-7 interpolation:
    * `pos = p*(n-1)` (0-indexed), value = v(floor) + (v(ceil) - v(floor)) *
    * (pos - floor) — what exact `percentile` / DuckDB `quantile_cont` /
    * numpy compute. */
  private def quantiles(
      grouped: DataFrame,
      ns: Map[String, (Long, Long, Double, Double)],
      prob: Double): Map[String, Option[Double]] = {
    val done = scala.collection.mutable.Map.empty[String, Option[Double]]
    var live = Map.empty[String, Bracket]

    ns.foreach { case (k, (n, d, mn, mx)) =>
      if (n == 0L) done(k) = None
      else {
        val pos = prob * (n - 1).toDouble
        val lower = math.floor(pos).toLong
        val r1 = lower + 1L                           // 1-indexed straddling ranks
        val r2 = math.ceil(pos).toLong + 1L
        live += k -> Bracket(mn, mx, 0L, d, r1, r2, pos - lower)
      }
    }

    var round = 0
    while (live.nonEmpty) {
      round += 1
      // resolve collapsed brackets
      val (flat, open) = live.partition { case (_, b) => b.lo == b.hi }
      flat.foreach { case (k, b) => done(k) = Some(b.lo) }
      live = open
      if (live.nonEmpty) {
        val (smalls, bigs) =
          live.partition { case (_, b) => b.distinct <= FinalizeDistinct || round > MaxRounds }

        if (smalls.nonEmpty) {
          // finalize: collect the bounded (value, cnt) tails and walk to the
          // target order statistics
          val cond = smalls.map { case (k, b) =>
            col("__k") === k && col("__v").between(b.lo, b.hi)
          }.reduce(_ || _)
          val tail = grouped.filter(col("__v").isNotNull && cond)
            .select("__k", "__v", "__cnt").collect()
            .groupBy(_.getString(0))
          smalls.foreach { case (k, b) =>
            val vs = tail(k).map(r => (r.getDouble(1), r.getLong(2))).sortBy(_._1)
            var cum = b.offset
            var v1 = Double.NaN
            var v2 = Double.NaN
            var i = 0
            while (i < vs.length && cum < b.r2) {
              cum += vs(i)._2
              if (v1.isNaN && cum >= b.r1) v1 = vs(i)._1
              if (cum >= b.r2) v2 = vs(i)._1
              i += 1
            }
            // lerp as v1*(1-f) + v2*f — the exact form DuckDB quantile_cont
            // and Spark Percentile evaluate (v1 + (v2-v1)*f differs by an
            // ulp at some fracs, which a hash compare catches)
            done(k) = Some(v1 * (1.0 - b.frac) + v2 * b.frac)
          }
          live = bigs
        }

        if (bigs.nonEmpty) {
          // one bucket-count pass for every still-wide bracket
          val cond = bigs.map { case (k, b) =>
            col("__k") === k && col("__v").between(b.lo, b.hi)
          }.reduce(_ || _)
          val bidx = bigs.map { case (k, b) =>
            when(col("__k") === k, least(lit(Buckets - 1), greatest(lit(0),
              floor((col("__v") - lit(b.lo)) / lit(b.hi - b.lo) * lit(Buckets)))).cast("int"))
          }.reduce(_ otherwise _)
          val hist = grouped.filter(col("__v").isNotNull && cond)
            .select(col("__k"), bidx.as("__b"), col("__v"), col("__cnt"))
            .groupBy("__k", "__b")
            .agg(sum(col("__cnt")).as("w"), min(col("__v")).as("mn"),
              max(col("__v")).as("mx"), count(lit(1)).as("g"))
            .collect()
            .groupBy(_.getString(0))
          live = bigs.map { case (k, b) =>
            val bs = hist(k).map(r =>
              (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
              .sortBy(_._1)
            // first buckets whose cumulative weight reaches r1 / r2
            var cum = b.offset
            var i1 = -1
            var i2 = -1
            var i = 0
            while (i < bs.length && i2 < 0) {
              cum += bs(i)._2
              if (i1 < 0 && cum >= b.r1) i1 = i
              if (i2 < 0 && cum >= b.r2) i2 = i
              i += 1
            }
            val offBelow = b.offset + bs.take(i1).map(_._2).sum
            val sel = bs.slice(i1, i2 + 1)
            k -> Bracket(sel.head._3, sel.last._4, offBelow,
              sel.map(_._5).sum, b.r1, b.r2, b.frac)
          }
        }
      }
    }
    done.toMap
  }

  /** Sketch-mode profile: one lazy aggregation pass, HLL++ cardinalities,
    * t-digest-style approximate medians — no Expand, bounded buffers. */
  private def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        approx_count_distinct(col(c)).as(s"__d_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        percentile_approx(col(c).cast("double"), lit(0.5), lit(10000)).as(s"__med_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__n_$c").as("n"),
        (col("__rows") - col(s"__n_$c")).as("n_null"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"),
        col(s"__med_$c").as("median"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Categorical-column profile: per column, row/null counts, exact
    * distinct count, and the top-`topK` values with counts as a
    * deterministic `value:count|...` string (ties broken by value).
    *
    * Same scale posture as the numeric profile: the columns melt to a
    * `(col_name, value) -> cnt` grain in ONE map-side-combined shuffle
    * (the only corpus-sized movement); `n_distinct` is a plain count of
    * that grain — never a countDistinct Expand; the top-k rank window is
    * per-column over the already-compressed grain and bounded by
    * WindowGroupLimit, and the final assembly aggregates at most `topK`
    * rows per column. */
  def profileCategorical(
      df: DataFrame,
      cols: Seq[String],
      topK: Int = 5): DataFrame = {
    require(cols.nonEmpty && topK > 0, "need columns and topK > 0")
    val stackArgs = cols.map(c => s"'$c', CAST(`$c` AS STRING)").mkString(", ")
    val grouped = df
      .select(expr(s"stack(${cols.size}, $stackArgs) AS (col_name, value)"))
      .groupBy("col_name", "value").agg(count(lit(1)).as("cnt"))
    val summary = grouped.groupBy("col_name").agg(
      sum(col("cnt")).as("n"),
      coalesce(sum(when(col("value").isNull, col("cnt"))), lit(0L)).as("n_null"),
      count(when(col("value").isNotNull, lit(1))).as("n_distinct"))
    val w = Window.partitionBy(col("col_name"))
      .orderBy(col("cnt").desc, col("value"))
    val top = grouped.filter(col("value").isNotNull)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .groupBy("col_name")
      .agg(array_join(array_sort(collect_list(
        struct(col("rk"), concat_ws(":", col("value"), col("cnt")).as("s"))))
        .getField("s"), "|").as("top_values"))
    summary.join(top, Seq("col_name"), "left").orderBy("col_name")
  }

  /** Tukey IQR outlier screen at the key grain: exact per-key quartiles
    * via the bucket-refinement selection kernel ([[exactQuantilesByKey]] —
    * no value buffering), fences `q1 − k·IQR` / `q3 + k·IQR`, then ONE
    * pass over the data counting fence violations. The bounds table is
    * key-grain (broadcast-sized under the same low-key-cardinality
    * contract as the kernel); the corpus is read once for the quantile
    * grain and once for the count — no sort, no per-key value collection.
    * Fence arithmetic is two IEEE ops on engine-identical quartiles, so
    * the doubles replay bit-for-bit in any engine's `quantile_cont`. */
  def iqrOutliers(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      k: Double = 1.5): DataFrame = {
    require(!df.columns.contains("__iq_v"),
      "input must not contain reserved internal column __iq_v")
    val q = exactQuantilesByKey(df, keyCol, valueCol, Seq(0.25, 0.75))
    val bounds = q.groupBy(keyCol)
      .agg(
        max(when(col("prob") === 0.25, col("value"))).as("q1"),
        max(when(col("prob") === 0.75, col("value"))).as("q3"))
      .withColumn("lo", col("q1") - lit(k) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(k) * (col("q3") - col("q1")))
    df.select(col(keyCol).cast("string").as(keyCol),
        col(valueCol).cast("double").as("__iq_v"))
      .where(col("__iq_v").isNotNull)
      .join(broadcast(bounds), Seq(keyCol))
      .groupBy(keyCol)
      .agg(
        count(lit(1)).as("n"),
        max(col("q1")).as("q1"), max(col("q3")).as("q3"),
        max(col("lo")).as("lo"), max(col("hi")).as("hi"),
        Rollups.countIf(col("__iq_v") < col("lo")).as("n_low"),
        Rollups.countIf(col("__iq_v") > col("hi")).as("n_high"))
      .withColumn("n_outliers", col("n_low") + col("n_high"))
      .orderBy(keyCol)
  }

  /** Robust (MAD) outlier screen at the key grain: exact per-key median
    * via the bucket-refinement kernel, exact median of |value − median|
    * (a second kernel pass over the derived deviation column — still no
    * value buffering), fences `med ± k·MAD` (Hampel's k = 3 default),
    * then ONE counting pass. Resistant to the fat tails that drag the
    * IQR fences ([[iqrOutliers]]) outward. Fence arithmetic is single
    * IEEE ops on engine-identical medians, so any engine's R-7
    * `quantile_cont` replays the doubles bit-for-bit. Same
    * low-key-cardinality contract as [[exactMedianByKey]]; the corpus is
    * read three times (median grain, deviation grain, count), never
    * sorted, never collected. */
  def madOutliers(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      k: Double = 3.0): DataFrame = {
    require(!df.columns.exists(Set("__mo_v", "__mo_ad", "median", "mad")),
      "input must not contain reserved columns __mo_v/__mo_ad/median/mad")
    val med = exactMedianByKey(df, keyCol, valueCol)
    val dev = df.select(col(keyCol).cast("string").as(keyCol),
        col(valueCol).cast("double").as("__mo_v"))
      .where(col("__mo_v").isNotNull)
      .join(broadcast(med), Seq(keyCol))
      .withColumn("__mo_ad", abs(col("__mo_v") - col("median")))
    val mad = exactMedianByKey(dev, keyCol, "__mo_ad")
      .withColumnRenamed("median", "mad")
    val bounds = med.join(mad, Seq(keyCol))
      .withColumn("lo", col("median") - lit(k) * col("mad"))
      .withColumn("hi", col("median") + lit(k) * col("mad"))
    dev.select(col(keyCol), col("__mo_v"))
      .join(broadcast(bounds), Seq(keyCol))
      .groupBy(keyCol)
      .agg(
        count(lit(1)).as("n"),
        max(col("median")).as("med"), max(col("mad")).as("mad"),
        max(col("lo")).as("lo"), max(col("hi")).as("hi"),
        Rollups.countIf(col("__mo_v") < col("lo")).as("n_low"),
        Rollups.countIf(col("__mo_v") > col("hi")).as("n_high"))
      .withColumn("n_outliers", col("n_low") + col("n_high"))
      .orderBy(keyCol)
  }

  /** Exact Gini coefficient of a nonnegative integer measure per group —
    * the inequality audit for corpus governance (how unevenly are tokens
    * spread over documents / docs over sources?): G = (2·Σ i·x_(i) −
    * (n+1)·Σx) / (n·Σx) over ascending-sorted values, computed CLOSED-FORM
    * on the distinct-value grain: a run of `c` equal values `v` starting
    * after cumulative count `a` contributes `v·(c·a + c(c+1)/2)` to
    * Σ i·x_(i). All arithmetic in decimal(38,0) (Σ i·x_i reaches ~n²·v —
    * past long at corpus scale), floor-ppm output, HUGEINT-replayable.
    *
    * Scale shape: one map-side-combined shuffle to the (key, value)
    * grain; the cumulative window runs per key ON THAT GRAIN (bounded by
    * per-key distinct values, never the corpus); two tiny per-key folds.
    * Returns (keyCol, n, total, gini_ppm); gini_ppm null when n·Σx = 0. */
  def giniByKey(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def floorDiv(a: Column, b: Column): Column = (a - pmod(a, b)) / b
    val grain = df
      .groupBy(col(keyCol), col(valCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v"))
    val ranked = grain
      .withColumn("__a", coalesce(
        sum(col("__c")).over(w) - col("__c"), lit(0L)))
      .withColumn("__s1",
        dec(col("__v")) * (dec(col("__c")) * dec(col("__a")) +
          floorDiv(dec(col("__c")) * dec(col("__c") + 1L), dec(lit(2)))))
    ranked.groupBy(col(keyCol))
      .agg(sum(col("__c")).as("n"),
        sum(col("__v") * col("__c")).as("total"),
        sum(col("__s1")).as("__S1"))
      .withColumn("gini_ppm",
        when(dec(col("n")) * dec(col("total")) > 0,
          floorDiv(
            (dec(lit(2)) * col("__S1") -
              dec(col("n") + 1L) * dec(col("total"))) * lit(1000000),
            dec(col("n")) * dec(col("total"))).cast("long")))
      .select(col(keyCol), col("n"), col("total"), col("gini_ppm"))
  }

  /** Shuffle-key skew audit — the pre-flight a join/agg planner runs
    * before hashing a 100 TB fact on `keyCol`: row count, distinct keys,
    * the heaviest key's absolute count and ppm share, the top-10 keys'
    * combined mass, and the mean rows/key (floor). A max_share_ppm near
    * 1e6/partitions says the biggest key alone fills a partition — salt
    * or AQE-skew-split before shuffling (the q86 bucket-occupancy probe,
    * generalized to any key).
    *
    * Scale shape: one map-side-combined aggregate to the key grain, a
    * bounded top-10 (TakeOrdered — ties broken by key for engine parity),
    * then 1-row folds; nothing bigger than the key table is ever moved,
    * and the output is a single row. */
  def keySkewAudit(df: DataFrame, keyCol: String): DataFrame = {
    def floorDiv(a: Column, b: Column) = ((a - pmod(a, b)) / b).cast("long")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__cnt"))
    val top10 = counts
      .orderBy(col("__cnt").desc, col(keyCol).asc).limit(10)
      .agg(sum(col("__cnt")).as("__t10"))
    counts
      .agg(sum(col("__cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("__cnt")).as("max_cnt"))
      .crossJoin(broadcast(top10))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"),
        floorDiv(col("max_cnt") * 1000000L, col("n_rows")).as("max_share_ppm"),
        floorDiv(col("__t10") * 1000000L, col("n_rows")).as("top10_mass_ppm"),
        floorDiv(col("n_rows"), col("n_keys")).as("mean_cnt"))
  }

  /** Exact ROC-AUC of a score against a boolean label per group, via the
    * Mann-Whitney identity AUC = U₁/(n₁n₀) with midrank tie handling —
    * the eval-harness primitive (how predictive is this quality score /
    * filter feature of the label?) computed exactly, engine-portably, in
    * ONE pass over the distinct-score grain. Doubled rank-sums keep the
    * midranks integral: a run of c tied values with `a` values strictly
    * below contributes c₁·(2a + c + 1) to 2R₁, so
    *
    *   u2 = 2U₁ = Σ c₁(2a + c + 1) − n₁(n₁+1),
    *   auc_ppm = ⌊10⁶ · u2 / (2 n₁ n₀)⌋  (null when n₁n₀ = 0).
    *
    * All in decimal(38,0): 2R₁ reaches ~n² — past long at ~3e9 rows per
    * group, and groups at corpus scale are bigger (HUGEINT replays it).
    *
    * Scale shape: one map-side-combined shuffle to the (group, score)
    * distinct grain; the cumulative-count window runs per group ON THAT
    * GRAIN (bounded by per-group distinct scores, never corpus rows —
    * the [[giniByKey]] discipline); one tiny per-group fold. No global
    * sort, no joins. */
  def rankSumAuc(
      df: DataFrame,
      keyCol: String,
      scoreCol: String,
      labelCol: String): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def floorDiv(a: Column, b: Column): Column = (a - pmod(a, b)) / b
    val grain = df
      .groupBy(col(keyCol), col(scoreCol).as("__v"))
      .agg(count(lit(1)).as("__c"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("__c1"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v"))
    grain
      .withColumn("__a", coalesce(sum(col("__c")).over(w) - col("__c"), lit(0L)))
      .withColumn("__r2",
        dec(col("__c1")) * dec(lit(2L) * col("__a") + col("__c") + 1L))
      .groupBy(col(keyCol))
      .agg(sum(col("__c1")).as("n_pos"),
        sum(col("__c") - col("__c1")).as("n_neg"),
        sum(col("__r2")).as("__2r1"))
      .withColumn("u2",
        (col("__2r1") - dec(col("n_pos")) * dec(col("n_pos") + 1L))
          .cast("decimal(38,0)"))
      .withColumn("auc_ppm",
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          floorDiv(col("u2") * lit(1000000),
            dec(lit(2L)) * dec(col("n_pos")) * dec(col("n_neg"))).cast("long")))
      .select(col(keyCol), col("n_pos"), col("n_neg"), col("auc_ppm"))
  }

  /** Midrank percentile transform — maps each row's value to its
    * percentile WITHIN its group (midrank/n, floor ppm): the score
    * normalization that makes per-source thresholds comparable when
    * sources have wildly different scale distributions (a 75th-percentile
    * doc is "equally long for its source" everywhere — the fair-gate
    * companion to q161's calibration table). Midrank of a run of c tied
    * values with `a` strictly below is a + (c+1)/2; doubled to stay
    * integral: pct_ppm = ⌊10⁶·(2a + c + 1) / (2n)⌋.
    *
    * Scale shape: the (group, value) DISTINCT grain carries both windows
    * (cumulative + group total — the [[rankSumAuc]] discipline), then one
    * join back to rows on (group, value); no corpus-grain sort.
    *
    * Returns df's (idCol, keyCol, valCol) plus `pct_ppm`. */
  def percentileNormalize(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      idCol: String): DataFrame = {
    def floorDiv(a: Column, b: Column) = ((a - pmod(a, b)) / b).cast("long")
    val grain = df
      .groupBy(col(keyCol), col(valCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v"))
    val pct = grain
      .withColumn("__a", coalesce(sum(col("__c")).over(w) - col("__c"), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col(keyCol))))
      .select(col(keyCol).as("__k2"), col("__v").as("__v2"),
        floorDiv((lit(2L) * col("__a") + col("__c") + 1L) * lit(1000000L),
          lit(2L) * col("__n")).as("pct_ppm"))
    df.select(col(idCol), col(keyCol), col(valCol).cast("long").as("__val"))
      .join(pct, col(keyCol) === col("__k2") && col("__val") === col("__v2"))
      .select(col(idCol), col(keyCol), col("__val").as(valCol), col("pct_ppm"))
  }

  /** Benford leading-digit audit per key — the financial-data quality
    * screen (Nigrini's fraud/corruption test, equally a synthetic-data
    * detector: generated numeric columns rarely reproduce the log-uniform
    * leading-digit law): observed first-digit shares of a positive
    * measure vs Benford's P(d) = log₁₀(1 + 1/d), deviation per digit in
    * ppm. The expected shares are FIXED integer literals (floor-ppm of
    * the law), so the whole audit is exact integer arithmetic — no logs
    * at runtime, any engine replays it bit-for-bit.
    *
    * The leading digit is taken portably as the first character of the
    * decimal rendering of floor(v) (rows with floor(v) < 1 are excluded —
    * Benford is a magnitude law; zero/negative values have no leading
    * digit). Every (key, digit) cell is reported, zeros included, via a
    * 9-row broadcast digit dimension — an absent digit is itself the
    * strongest Benford violation and must not vanish from the artifact.
    *
    * Scale shape: one map-side-combined shuffle to the (key, digit)
    * grain (≤ 9 rows per key), a |keys|-row total rollup joined back on
    * the key, and the 9-row dimension broadcast. Nothing bigger than the
    * key table moves after the first aggregate.
    *
    * Returns (keyCol, digit, n_d, share_ppm, benford_ppm, dev_ppm). */
  def benfordAudit(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    def floorDiv(a: Column, b: Column) = ((a - pmod(a, b)) / b).cast("long")
    // floor-ppm of log10(1 + 1/d), d = 1..9
    val benfordPpm = Seq(301029L, 176091L, 124938L, 96910L, 79181L,
      66946L, 57991L, 51152L, 45757L)
    val spark = df.sparkSession
    import spark.implicits._
    val dim = benfordPpm.zipWithIndex
      .map { case (p, i) => ((i + 1).toLong, p) }
      .toDF("digit", "benford_ppm")
    val digits = df
      .select(col(keyCol).as("__k"), floor(col(valCol)).cast("long").as("__fv"))
      .filter(col("__fv") >= 1L)
      .select(col("__k"),
        substring(col("__fv").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("__k", "digit").agg(count(lit(1)).as("n_d"))
    val totals = digits.groupBy("__k").agg(sum(col("n_d")).as("__n"))
    totals
      .crossJoin(broadcast(dim))
      .join(digits, Seq("__k", "digit"), "left")
      .withColumn("n_d", coalesce(col("n_d"), lit(0L)))
      .withColumn("share_ppm", floorDiv(col("n_d") * lit(1000000L), col("__n")))
      .select(col("__k").as(keyCol), col("digit"), col("n_d"),
        col("share_ppm"), col("benford_ppm"),
        abs(col("share_ppm") - col("benford_ppm")).as("dev_ppm"))
  }
}
