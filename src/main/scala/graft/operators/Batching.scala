package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Length-bucketed batch assignment — the training-prep step that sorts
  * documents by length and deals them into fixed-size batches so each
  * batch pads to ITS OWN maximum, not the corpus maximum (the standard
  * padding-waste minimization before packing/collation).
  *
  * The global rank by (length desc, id) is computed WITHOUT a
  * single-partition window over the corpus (the q12 pagination hazard):
  *  1. histogram the DISTINCT lengths (one map-side-combined shuffle to a
  *     tiny table — lengths are bounded by the longest document);
  *  2. cumulative offsets over that tiny table (the only unpartitioned
  *     window, sized #distinct-lengths, not #docs);
  *  3. broadcast the offsets back and rank WITHIN each length partition —
  *     distributed, bounded by the largest same-length cohort.
  * rank = offset(len) + intra-length rank; exact, deterministic, and every
  * corpus-sized stage is hash-partitioned. This is the same
  * distinct-value-grain move as Profiling's median selection.
  */
object Batching {

  /** Adds `(rank, batch)` to `docs`: rank = 1-based position in (lenCol
    * desc, idCol asc) order, batch = (rank-1) / batchSize in exact integer
    * arithmetic. */
  def lengthBatches(
      docs: DataFrame,
      idCol: String,
      lenCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    // reserved-internal-column contract (the SkewJoin/RangeJoin/Sharding
    // guard): a caller __len/__off would make the broadcast-join condition
    // ambiguous; rank/batch are the output columns we add
    val reserved = Set("__len", "__off", "rank", "batch")
    require(!docs.columns.exists(reserved),
      s"column names ${reserved.mkString(", ")} are reserved by lengthBatches")
    val counts = docs.groupBy(col(lenCol).cast("long").as("__len"))
      .agg(count(lit(1)).as("__n"))
    // length-GRAIN window (distinct length values, not docs) — bounded
    // domain, single partition intentional
    val offsets = counts.withColumn("__off",
      coalesce(
        sum(col("__n")).over(
          Window.partitionBy(lit(0)).orderBy(col("__len").desc)) - col("__n"),
        lit(0L)))
    val intra = Window.partitionBy(col(lenCol)).orderBy(col(idCol))
    val ranked = docs
      .join(broadcast(offsets.select(col("__len"), col("__off"))),
        col(lenCol).cast("long") === col("__len"))
      .withColumn("rank", (col("__off") + row_number().over(intra)).cast("long"))
      .drop("__len", "__off")
    // exact integer floor division (the q71 pattern): (a - a mod b) / b is
    // an exact integer-valued double
    val a = col("rank") - 1
    ranked.withColumn("batch",
      ((a - pmod(a, lit(batchSize.toLong))) / batchSize).cast("long"))
  }

  /** `ntile(n) OVER (PARTITION BY keys ORDER BY valCol, idCol)` WITHOUT a
    * per-key corpus window — the scale-safe twin of the builtin. A plain
    * `ntile` puts an entire key's rows into ONE window partition; when the
    * key is e.g. document language, the dominant key is half the corpus in
    * a single task. Here the rank comes from the [[lengthBatches]]
    * distinct-value-grain histogram (offsets over the tiny (keys, value)
    * count table, intra-cohort row_number), and the tile from exact
    * integer arithmetic reproducing ntile's floor-distribution semantics:
    * the first `count mod n` tiles get `floor(count/n)+1` rows, the rest
    * `floor(count/n)`. Bit-identical to the builtin, no skewed window. */
  def groupedNtile(
      docs: DataFrame,
      keyCols: Seq[String],
      valCol: String,
      idCol: String,
      n: Int,
      outCol: String): DataFrame = {
    require(n > 0, "n must be positive")
    val gKeys = keyCols.map(k => s"__g_$k")
    val sKeys = keyCols.map(k => s"__s_$k")
    val cKeys = keyCols.map(k => s"__c_$k")
    val reserved = Set("__val", "__n", "__off", "__tot", "__rank", "__vlo",
      "__vhi", "__b", "__bn", "__cb", "__carry", outCol) ++ gKeys ++ sKeys ++ cKeys
    require(!docs.columns.exists(reserved),
      s"column names ${reserved.mkString(", ")} are reserved by groupedNtile")
    val keys = keyCols.map(col)
    def eq(pairs: Seq[(String, String)]): Column =
      pairs.map { case (a, b) => col(a) <=> col(b) }.foldLeft(lit(true))(_ && _)
    val counts = docs
      .groupBy(keys :+ col(valCol).cast("long").as("__val"): _*)
      .agg(count(lit(1)).as("__n"))
    // Per-key totals + value bounds in one agg, then the two-level bucket
    // carry (the q155/q158 kernel) for the value-grain cumulative: with an
    // EMPTY key set and a high-cardinality value column, the old direct
    // cumulative window was a genuinely unbounded global window. Buckets
    // are 4096 uniform slices of each key's [vlo, vhi] (floor of an
    // increasing affine map — monotone, equal values share a bucket); the
    // carry window sees <= 4096 rows per key.
    val gstats = counts.groupBy(keys: _*).agg(
      min(col("__val")).as("__vlo"), max(col("__val")).as("__vhi"),
      sum(col("__n")).as("__tot"))
      .select(keyCols.map(k => col(k).as(s"__s_$k")) ++
        Seq(col("__vlo"), col("__vhi"), col("__tot")): _*)
    val withB = counts.join(broadcast(gstats), eq(keyCols.zip(sKeys)))
      .withColumn("__b",
        when(col("__vhi") <= col("__vlo"), lit(0L))
          .otherwise(least(lit(4095L),
            floor((col("__val").cast("double") - col("__vlo").cast("double"))
              * 4096.0 /
              (col("__vhi").cast("double") - col("__vlo").cast("double") + 1.0))
              .cast("long"))))
      .drop(sKeys: _*)
    val wCarry =
      if (keyCols.isEmpty)
        // bounded domain (<= 4096 buckets) — single partition intentional
        Window.partitionBy(lit(0)).orderBy(col("__cb"))
      else Window.partitionBy(cKeys.map(col): _*).orderBy(col("__cb"))
    val carries = withB
      .groupBy(keys :+ col("__b"): _*).agg(sum(col("__n")).as("__bn"))
      .select(keyCols.map(k => col(k).as(s"__c_$k")) ++
        Seq(col("__b").as("__cb"), col("__bn")): _*)
      .withColumn("__carry",
        coalesce(sum(col("__bn")).over(
          wCarry.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wIntra = Window.partitionBy(keys :+ col("__b"): _*).orderBy(col("__val"))
    // rename the keys before joining back (the lengthBatches idiom) — a
    // derived-DataFrame self-join on same-named columns is ambiguous
    val offsets = withB
      .join(broadcast(carries),
        eq(keyCols.zip(cKeys)) && col("__b") <=> col("__cb"))
      .withColumn("__off",
        col("__carry") + coalesce(sum(col("__n")).over(
          wIntra.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(keyCols.map(k => col(k).as(s"__g_$k")) ++
        Seq(col("__val"), col("__off"), col("__tot")): _*)
    val intra = Window.partitionBy(keys :+ col(valCol): _*).orderBy(col(idCol))
    val ranked = docs.join(broadcast(offsets),
      keyCols.map(k => col(k) <=> col(s"__g_$k")).reduce(_ && _) &&
        col(valCol).cast("long") <=> col("__val"))
      .drop(gKeys: _*)
      .withColumn("__rank", col("__off") + row_number().over(intra))
    // exact integer floor division via (a - a mod b) / b
    def floorDiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("long")
    val q = floorDiv(col("__tot"), lit(n.toLong))
    val rem = pmod(col("__tot"), lit(n.toLong))
    val r = col("__rank")
    val tile = when(r <= rem * (q + 1L), floorDiv(r - 1L, q + 1L) + 1L)
      .otherwise(rem + floorDiv(r - 1L - rem * (q + 1L), q) + 1L)
    ranked
      .withColumn(outCol, tile)
      .drop("__val", "__off", "__tot", "__rank")
  }

  /** Packing-efficiency audit: for each candidate context length, what a
    * no-packing loader wastes — each document padded up to a multiple of
    * `ctx` — vs the ideal (fully packed) sequence count. The
    * capacity-planning companion to [[lengthBatches]]: run BEFORE choosing
    * a context length / packing strategy, not after.
    *
    * All integer: n_seqs = Σ ceil(t/ctx), padded = n_seqs·ctx,
    * overhead_ppm = (padded − tokens)·1e6 // padded (floor),
    * ideal_seqs = ceil(Σt / ctx).
    *
    * Scale shape: a projection explode of |ctxs| rows per doc over the
    * 1-column token-count projection (|ctxs| is a small constant), then
    * one map-side-combined aggregate to the |ctxs|-row grain. No joins,
    * no windows, no corpus shuffle. */
  def packingEfficiency(
      docs: DataFrame,
      tokenCol: String,
      ctxLengths: Seq[Long]): DataFrame = {
    require(ctxLengths.nonEmpty && ctxLengths.forall(_ > 0), "need positive ctxs")
    def floorDiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("long")
    val t = col(tokenCol).cast("long")
    val seqs = floorDiv(t + col("ctx") - 1L, col("ctx"))
    docs.select(t.as(tokenCol))
      .select(col(tokenCol),
        explode(array(ctxLengths.map(lit): _*)).as("ctx"))
      .groupBy("ctx")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("n_tokens"),
        sum(seqs).as("n_seqs"),
        sum(seqs * col("ctx")).as("padded_tokens"))
      .withColumn("overhead_ppm",
        floorDiv((col("padded_tokens") - col("n_tokens")) * 1000000L,
          greatest(col("padded_tokens"), lit(1L))))
      .withColumn("ideal_seqs",
        floorDiv(col("n_tokens") + col("ctx") - 1L, col("ctx")))
  }
}
