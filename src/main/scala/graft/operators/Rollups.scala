package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation operator family (reference §2.4 A1–A14).
  *
  * The reference's materialized views are conditional-count pivots
  * ("sentiment histograms": `sum(case when eff_sentiment='positive' then 1
  * else 0 end)` per (date, entity) — `sql/article_daily_counts_mv.sql:11-17`),
  * top-N string aggregation (`sql/negative_summary_mv.sql:43-46`), and
  * screen/rank aggregates with HAVING + top-k (`dashboard_app/app.py:4400-4426`).
  *
  * Scale posture: all of these are hash aggregates with map-side partial
  * aggregation — one shuffle on the group key, partials combined per
  * executor before exchange. Counts and conditional counts shrink to one row
  * per group on the map side, so shuffle volume is O(groups), not O(rows).
  * Numeric sums are taken over DecimalType so results are order-independent
  * and exactly reproducible (double summation is order-dependent and a
  * correctness hazard for the hash-compare oracle AND for any re-run diff at
  * scale).
  */
object Rollups {

  /** `sum(case when cond then 1 else 0 end)` — conditional count (A1/A2). */
  def countIf(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))

  /** Exact, order-independent sum of a double column: cast through decimal.
    * scale picks how many fractional digits are significant in the source. */
  def exactSum(c: Column, precision: Int = 18, scale: Int = 2): Column =
    sum(c.cast(s"decimal($precision,$scale)"))

  /** Exact, order-independent sum of a FIXED-POINT double column (money,
    * 2-decimal metrics) via scaled-long arithmetic: recover the integer
    * `value * 10^scale` (round() here only snaps a <=1e-8 representation
    * error back to the integer — any rounding mode agrees), sum primitive
    * longs, divide once. Bit-identical to [[exactSum]]+cast-to-double —
    * both produce the exact rational total then one correctly-rounded cast —
    * but ~2x faster (codegen'd long adds, no per-row Decimal allocation).
    * Requires `|value|*10^scale` integral and total < 2^63/10^scale. */
  def exactMoneySum(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale)
    sum(round(c * f).cast("long")).cast("double") / f
  }

  /** Exact `sum(price * (1 - discount))` for 2-decimal price/discount
    * columns, as scaled-long arithmetic (4-decimal products summed as
    * longs). Bit-identical to summing `(price*(1-discount))::decimal(18,6)`:
    * the double product's error (~1e-9 relative) is far below the 6th
    * decimal, so both paths recover the same exact 4-decimal rational. */
  def exactDiscountedSum(price: Column, discount: Column): Column =
    sum(round(price * 100).cast("long") * (lit(100L) - round(discount * 100).cast("long")))
      .cast("double") / 10000.0

  /** Top-k alphabetically-first strings matching a predicate, joined with a
    * separator (A4: `array_to_string((array_agg(title order by title) filter
    * (where negative))[1:3], ' | ')`).
    *
    * The aggregation runs through [[graft.functions.BoundedTopKStrings]]:
    * buffers hold at most k strings map-side and per merge, so a hot group
    * costs O(k) memory — no value-list materialization anywhere (the
    * composed `sort_array(collect_list(...))` form buffers the whole
    * group; equality with it is pinned in FunctionsSpec). The `when(pred,
    * value)` branch yields nulls for unmatched rows, which the Aggregator
    * skips — the same filtered-aggregate composition `collect_list` gave. */
  def topKStringsAgg(value: Column, pred: Column, k: Int, sep: String = " | "): Column =
    udaf(graft.functions.BoundedTopKStrings(k)).apply(when(pred, value))

  /** Tagged-union daily metrics (reference J4 `entity_daily_metrics_v`):
    * instead of N left joins over N pre-aggregated sources (the reference's
    * `sql/entity_daily_metrics_v.sql:122-167` does union-of-keys + 5 left
    * joins), union the *inputs* with a source tag and pivot with conditional
    * counts — ONE shuffle instead of six.
    *
    * @param sources (tag, dataframe) pairs; each df must expose `keyCols`
    */
  def taggedUnionCounts(sources: Seq[(String, DataFrame)], keyCols: Seq[String]): DataFrame = {
    val tagged = sources.map { case (tag, df) =>
      df.select(keyCols.map(col): _*).withColumn("__src", lit(tag))
    }.reduce(_ unionByName _)
    val pivots = sources.map { case (tag, _) =>
      countIf(col("__src") === tag).as(s"${tag}_cnt")
    } :+ count(lit(1)).as("total_cnt")
    tagged.groupBy(keyCols.map(col): _*).agg(pivots.head, pivots.tail: _*)
  }

  /** Contingency table with chi-square decomposition — the categorical
    * independence screen (is `source` independent of `lang`? did the new
    * crawl shift the topic mix?) at corpus scale.
    *
    * ONE corpus-sized shuffle builds the (a, b) cell counts; everything
    * after runs on the CELL table, whose size is |A|·|B| (a low-cardinality
    * contract like the profiling kernels — enums, not ids), so the
    * marginal-total windows (two partitioned, one unpartitioned) are
    * bounded by the cell count, never the corpus. Integer marginals stay
    * exact; `expected` and `contribution` are a fixed two/three-op IEEE
    * sequence per CELL (no float summation anywhere), so every emitted
    * double replays bit-for-bit in any engine. The chi-square statistic is
    * the sum of `contribution` — left to the caller/report layer because a
    * float TOTAL is summation-order-dependent; the cell grain is the
    * portable contract. */
  def contingency(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(aCol, bCol).agg(count(lit(1)).as("observed"))
    // cell-table-grain windows: bounded by |A|x|B| (the grand-total window
    // carries the lit(0) bounded-domain annotation)
    val rowT = sum(col("observed")).over(Window.partitionBy(aCol))
    val colT = sum(col("observed")).over(Window.partitionBy(bCol))
    val allT = sum(col("observed")).over(Window.partitionBy(lit(0)))
    val e = (col("row_total") * col("col_total")).cast("double") /
      col("n").cast("double")
    cells
      .withColumn("row_total", rowT)
      .withColumn("col_total", colT)
      .withColumn("n", allT)
      .withColumn("expected", e)
      .withColumn("contribution", {
        val d = col("observed").cast("double") - col("expected")
        d * d / col("expected")
      })
  }

  /** Exact-sum Pearson correlation + OLS slope at the key grain.
    *
    * Spark's `corr` (and DuckDB's) accumulate co-moments in doubles, so
    * partition order changes the last bits — unusable under a bit-equality
    * oracle and non-reproducible across cluster layouts. This kernel makes
    * the SUMS exact instead: both columns become scaled longs (`round(x ·
    * 10^scale)` — exact for fixed-point sources, the repo's money policy),
    * the five co-moment sums accumulate in decimal (order-independent,
    * overflow-free), and only the FINAL Pearson/OLS arithmetic runs in
    * doubles — a fixed sequence of IEEE ops on engine-identical inputs, so
    * the result is bit-stable everywhere. One map-side-combined aggregate;
    * Pearson r is invariant to the common scaling, and the OLS slope is
    * scale-free when both columns share one scale.
    *
    * Degenerate keys (zero variance in either column) return null r/slope
    * rather than NaN/±Inf. */
  def pearsonByKey(
      df: DataFrame,
      keyCol: String,
      xCol: String,
      yCol: String,
      scale: Int = 2): DataFrame = {
    val f = math.pow(10, scale)
    val sums = df
      .select(col(keyCol),
        round(col(xCol) * f).cast("long").as("__pc_x"),
        round(col(yCol) * f).cast("long").as("__pc_y"))
      .where(col("__pc_x").isNotNull && col("__pc_y").isNotNull)
      .groupBy(keyCol)
      .agg(
        count(lit(1)).as("n"),
        sum(col("__pc_x").cast("decimal(38,0)")).cast("double").as("sx"),
        sum(col("__pc_y").cast("decimal(38,0)")).cast("double").as("sy"),
        sum((col("__pc_x") * col("__pc_x")).cast("decimal(38,0)")).cast("double").as("sxx"),
        sum((col("__pc_y") * col("__pc_y")).cast("decimal(38,0)")).cast("double").as("syy"),
        sum((col("__pc_x") * col("__pc_y")).cast("decimal(38,0)")).cast("double").as("sxy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val denX = col("n") * col("sxx") - col("sx") * col("sx")
    val denY = col("n") * col("syy") - col("sy") * col("sy")
    sums.select(col(keyCol), col("n"),
      when(denX > 0 && denY > 0, num / (sqrt(denX) * sqrt(denY))).as("r"),
      when(denX > 0, num / denX).as("slope"))
  }

  /** Spearman rank correlation per key — Pearson on midranks (ties →
    * average rank): the monotone-association companion to [[pearsonByKey]]
    * (outlier-robust: a single corrupt extreme value saturates Pearson but
    * moves each rank by at most one). Doubled midranks keep the ranks
    * integral (a run of c tied values with `a` strictly below has
    * 2·midrank = 2a + c + 1); co-moment sums run in decimal(38,0)
    * (rank products reach ~4n² per row, n³-scale sums — far past long at
    * corpus scale), and the final ρ is the same fixed IEEE sequence as
    * Pearson's, so DuckDB replays it bit-for-bit from HUGEINT sums.
    *
    * Scale shape: midranks come from the (key, value) DISTINCT grain
    * (one map-side-combined shuffle per variable + a per-key cumulative
    * window ON THAT GRAIN — never a corpus-grain sort) and join back to
    * rows on (key, value); the co-moment rollup is one aggregate. The
    * alternative row-grain rank window would sort each key's entire
    * partition — a one-partition death sentence when one key is half the
    * corpus.
    *
    * Returns (keyCol, n, rho). */
  def spearmanByKey(
      df: DataFrame,
      keyCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val base = df
      .select(col(keyCol).as("__k"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    def ranks(vc: String, out: String): DataFrame = {
      // two-level prefix sum for the cumulative smaller-value count (the
      // q158 sweep idiom, r13): the old single window partitioned by __k
      // alone sorted each key's ENTIRE value grain in one partition — a
      // one-partition-per-key sort that a high-cardinality value column
      // (prices) turns into the serial bottleneck (measured: q156 scaling
      // ratio 1.01 at 8→32 cores). Here the within-bucket prefix runs
      // partitioned by (__k, value >> 16) — parallel across buckets, each
      // bounded by 2^16 distinct values — and only the per-BUCKET totals
      // ride a per-key carry window (bucket grain, 2^16× smaller).
      // Midranks are bit-identical: a = carry + in is the same
      // strictly-smaller count (arithmetic shift is monotonic, so bucket
      // order == value order, negatives included).
      val grain = base.groupBy(col("__k"), col(vc)).agg(count(lit(1)).as("__c"))
        .withColumn("__b", shiftright(col(vc), 16))
      val wIn = org.apache.spark.sql.expressions.Window
        .partitionBy("__k", "__b").orderBy(col(vc))
      val perBucket = grain.groupBy("__k", "__b").agg(sum(col("__c")).as("__bc"))
      val wCarry = org.apache.spark.sql.expressions.Window
        .partitionBy("__k").orderBy(col("__b"))
      val carry = perBucket.withColumn("__carry",
          coalesce(sum(col("__bc")).over(wCarry) - col("__bc"), lit(0L)))
        .select(col("__k"), col("__b"), col("__carry"))
      grain
        .withColumn("__in", coalesce(sum(col("__c")).over(wIn) - col("__c"), lit(0L)))
        .join(carry, Seq("__k", "__b"))
        .select(col("__k"), col(vc),
          (lit(2L) * (col("__carry") + col("__in")) + col("__c") + 1L).as(out))
    }
    val ranked = base
      .join(ranks("__x", "__rx"), Seq("__k", "__x"))
      .join(ranks("__y", "__ry"), Seq("__k", "__y"))
    val sums = ranked.groupBy(col("__k"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("__rx"))).cast("double").as("sx"),
        sum(dec(col("__ry"))).cast("double").as("sy"),
        sum(dec(col("__rx")) * dec(col("__rx"))).cast("double").as("sxx"),
        sum(dec(col("__ry")) * dec(col("__ry"))).cast("double").as("syy"),
        sum(dec(col("__rx")) * dec(col("__ry"))).cast("double").as("sxy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val denX = col("n") * col("sxx") - col("sx") * col("sx")
    val denY = col("n") * col("syy") - col("sy") * col("sy")
    sums.select(col("__k").as(keyCol), col("n"),
      when(denX > 0 && denY > 0, num / (sqrt(denX) * sqrt(denY))).as("rho"))
  }
}
