package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization: Z-order (Morton) sort keys for
  * multi-dimensional scan locality — the write-side move that makes
  * min/max file statistics prune on BOTH join/filter dimensions at once
  * (a plain sort on (a, b) gives file pruning on `a` only; interleaving
  * the bits gives it on `a` AND `b` at ~√ resolution each).
  *
  * All arithmetic is exact long bit manipulation (shift/mask/sum) — a pure
  * projection that replays bit-for-bit in any engine, so layouts are
  * reproducible and auditable cross-engine.
  *
  * 100 TB posture: `zOrdered` is repartitionByRange on the z-value (one
  * range exchange — the same cost as the plain sorted write it replaces)
  * followed by an in-partition sort; file row-group stats then bound both
  * dimensions per file, and point/range predicates on either column prune
  * most files at planning time.
  */
object Layout {

  /** 2-D Morton value: bits of `x` at even positions, `y` at odd. Inputs
    * must be non-negative and < 2^bits (callers range-encode first);
    * bits <= 31 keeps the result exact in a long. The domain is ENFORCED:
    * an out-of-range value raises at execution time rather than silently
    * dropping high bits — silent truncation would alias distinct keys into
    * the same z-bucket and quietly void any locality audit built on it. */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    def checked(c: Column): Column = {
      val v = c.cast("long")
      when(v.isNull || v < 0 || v >= (1L << bits),
        raise_error(concat(
          lit(s"zValue2: input outside [0, 2^$bits): "), v.cast("string"))).cast("long"))
        .otherwise(v)
    }
    val (xc, yc) = (checked(x), checked(y))
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(xc, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(yc, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** 2-D Hilbert index (Hilbert curve xy2d, the standard quadrant-rotation
    * formulation): unlike Morton order, the Hilbert curve never jumps —
    * consecutive indices are always grid-adjacent — so equal-width index
    * buckets tile the plane into visibly tighter boxes (the q160 audit
    * measures exactly this). The per-bit rotation mutates (x, y), which a
    * pure expression tree would re-expand exponentially; instead each of
    * the `bits` iterations is ONE projection (`withColumn` chain —
    * whole-stage codegen fuses the chain into a single pass), mirrored
    * column-for-column by [[hilbert2SqlCtes]] for the DuckDB oracle.
    *
    * Adds `outCol` to `df`; inputs must be in [0, 2^bits) (enforced by
    * the same raise_error discipline as [[zValue2]]). */
  def withHilbert2(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      outCol: String): DataFrame = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    require(!df.columns.exists(c => c.startsWith("__h")),
      "input must not contain reserved internal columns __h*")
    def checked(c: Column): Column = {
      val v = c.cast("long")
      when(v.isNull || v < 0 || v >= (1L << bits),
        raise_error(concat(
          lit(s"withHilbert2: input outside [0, 2^$bits): "), v.cast("string")))
          .cast("long"))
        .otherwise(v)
    }
    var cur = df
      .withColumn("__hx", checked(col(xCol)))
      .withColumn("__hy", checked(col(yCol)))
      .withColumn("__hd", lit(0L))
    for (i <- bits - 1 to 0 by -1) {
      val s = 1L << i
      val rx = when(col("__hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      val ry = when(col("__hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      cur = cur
        .withColumn("__hrx", rx)
        .withColumn("__hry", ry)
        .withColumn("__hd",
          col("__hd") + lit(s * s) *
            (lit(3L) * col("__hrx")).bitwiseXOR(col("__hry")))
        .withColumn("__hxr",
          when(col("__hry") === 0L && col("__hrx") === 1L,
            lit(s - 1L) - col("__hx")).otherwise(col("__hx")))
        .withColumn("__hyr",
          when(col("__hry") === 0L && col("__hrx") === 1L,
            lit(s - 1L) - col("__hy")).otherwise(col("__hy")))
        .withColumn("__hx",
          when(col("__hry") === 0L, col("__hyr")).otherwise(col("__hxr")))
        .withColumn("__hy",
          when(col("__hry") === 0L, col("__hxr")).otherwise(col("__hyr")))
    }
    cur.withColumn(outCol, col("__hd"))
      .drop("__hx", "__hy", "__hd", "__hrx", "__hry", "__hxr", "__hyr")
  }

  /** DuckDB replay of [[withHilbert2]]: a chain of `bits` CTEs named
    * `<prefix>0..<prefix>bits`, each one rotation step. The input CTE
    * must expose columns `hx, hy` (plus any passthrough columns listed in
    * `keep`); the final CTE `<prefix><bits>` carries `keep` + `hd`. */
  def hilbert2SqlCtes(
      inputCte: String,
      bits: Int,
      keep: Seq[String],
      prefix: String = "hil"): String = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val keepCols = keep.mkString(", ")
    val init =
      s"${prefix}0 AS (SELECT $keepCols, hx, hy, CAST(0 AS BIGINT) AS hd FROM $inputCte)"
    val steps = (bits - 1 to 0 by -1).zipWithIndex.map { case (i, step) =>
      val s = 1L << i
      val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
      val xr = s"(CASE WHEN $ry = 0 AND $rx = 1 THEN ${s - 1} - hx ELSE hx END)"
      val yr = s"(CASE WHEN $ry = 0 AND $rx = 1 THEN ${s - 1} - hy ELSE hy END)"
      s"""${prefix}${step + 1} AS (SELECT $keepCols,
         |  (CASE WHEN $ry = 0 THEN $yr ELSE $xr END) AS hx,
         |  (CASE WHEN $ry = 0 THEN $xr ELSE $yr END) AS hy,
         |  hd + ${s * s} * xor(3 * $rx, $ry) AS hd
         |  FROM ${prefix}$step)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }

  /** The same computation as a SQL fragment (for generated oracles). */
  def zValue2Sql(x: String, y: String, bits: Int): String = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})", s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " + ", ")")
  }

  /** Small-files compaction planner — the other half of layout hygiene at
    * 100 TB (a date-partitioned table ingested in many micro-batches
    * accretes thousands of KB-scale files per partition; every query then
    * pays a task per file and the NameNode/listing pays the metadata).
    *
    * Driver-side METADATA op: lists the table's leaf files (one RPC sweep,
    * no data read), groups them by partition directory, and emits one row
    * per partition with the current file count/bytes and the target file
    * count `ceil(bytes / targetBytes)` — flagging only partitions whose
    * file count exceeds the target (those are the rewrite candidates).
    *
    * The rewrite itself is [[compactTo]]: read the partition, coalesce to
    * the planned count, write to a NEW location (never in place — an
    * in-place overwrite that fails mid-write loses the partition).
    */
  def compactionReport(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    import spark.implicits._
    val raw = new org.apache.hadoop.fs.Path(tablePath)
    val fs = raw.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualify so relativize sees the same scheme/authority as the listing
    val root = fs.makeQualified(raw)
    val it = fs.listFiles(root, true)
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith(".")) {
        val rel = root.toUri.relativize(f.getPath.getParent.toUri).getPath
        val part = if (rel.isEmpty) "." else rel.stripSuffix("/")
        val (n, b) = acc.getOrElse(part, (0L, 0L))
        acc(part) = (n + 1, b + f.getLen)
      }
    }
    acc.toSeq.map { case (part, (n, bytes)) =>
      val target = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
      (part, n, bytes, target, n > target)
    }.toDF("partition", "n_files", "bytes", "target_files", "needs_compaction")
      .orderBy("partition")
  }

  /** Rewrite one partition's data as `targetFiles` files at `destPath`
    * (coalesce, not repartition: a narrow merge of existing splits, no
    * shuffle). Callers swap the directory in atomically after validation. */
  def compactTo(
      spark: org.apache.spark.sql.SparkSession,
      srcPath: String,
      destPath: String,
      targetFiles: Int): Unit = {
    require(targetFiles > 0, "targetFiles must be positive")
    spark.read.parquet(srcPath)
      .coalesce(targetFiles)
      .write.mode("errorifexists").parquet(destPath)
  }

  /** Range-partition `df` into `numRanges` z-ordered write partitions and
    * sort within each — the layout a z-ordered table write uses. */
  def zOrdered(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      numRanges: Int): DataFrame = {
    // "__z" is internal; a caller column of that name would be silently
    // replaced by withColumn and then dropped from the output — refuse
    // (the AsofJoin/Scd2 reserved-name contract)
    require(!df.columns.contains("__z"), "column name __z is reserved")
    df.withColumn("__z", zValue2(col(xCol), col(yCol), bits))
      .repartitionByRange(numRanges, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** RLE compressibility audit: how many run-length entries a column
    * costs under a given physical layout — the encoding-choice question a
    * columnar writer answers per ROW GROUP (RLE/dictionary pay off only
    * when the clustering puts equal values adjacent; sorting by an
    * unrelated key destroys that). `zone` is the row-group analogue and
    * the unit of parallelism: runs are counted WITHIN zones (windows
    * partition by zone — bounded, never a global sort), exactly the scope
    * a writer encodes.
    *
    * Output (one row): `zones, rows, runs, avg_run_len, rle_ratio` —
    * `runs` = Σ per-zone value-change count (+1 per zone), `rle_ratio` =
    * runs/rows (1.0 = incompressible under RLE, →0 = highly runnable). */
  def rleRunsReport(
      df: DataFrame,
      zone: Column,
      orderInZone: Seq[Column],
      valueCol: Column): DataFrame = {
    require(!df.columns.exists(c => c.startsWith("__rle_")),
      "input must not contain reserved internal columns __rle_*")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__rle_z")).orderBy(orderInZone: _*)
    val marked = df
      .select(zone.as("__rle_z"), valueCol.as("__rle_v"), col("*"))
      .withColumn("__rle_new",
        when(lag(col("__rle_v"), 1).over(w).isNull ||
          lag(col("__rle_v"), 1).over(w) =!= col("__rle_v"), 1L)
          .otherwise(0L))
    marked.agg(
      count_distinct(col("__rle_z")).as("zones"),
      count(lit(1)).as("rows"),
      sum(col("__rle_new")).as("runs"),
      (count(lit(1)).cast("double") / sum(col("__rle_new")).cast("double"))
        .as("avg_run_len"),
      (sum(col("__rle_new")).cast("double") / count(lit(1)).cast("double"))
        .as("rle_ratio"))
  }

  /** Zone-map pruning report: what a `[lo, hi]` range predicate on
    * `statCol` would cost under a given physical layout, where `zone`
    * names the file/row-group a row would land in (a bucket of the
    * clustering key — the engine-side twin of a parquet footer's min/max
    * stats). A zone must be SCANNED iff its value envelope overlaps the
    * predicate interval (`max >= lo AND min <= hi` — the planning-time
    * test, which cannot consult the rows); `rows_matched` counts rows the
    * predicate actually selects, so `rows_scanned − rows_matched` is the
    * waste the layout forces. One shuffle to the zone grain, then a tiny
    * final aggregate; nothing is collected.
    *
    * This is the AUDIT for [[zOrdered]]/clustered writes: run it under
    * the natural layout and the clustered layout and compare
    * `zones_scanned` — the difference is the I/O the clustering buys
    * back at planning time. Output (one row): `zones_total,
    * zones_scanned, rows_total, rows_scanned, rows_matched`. */
  def pruningReport(
      df: DataFrame,
      zone: Column,
      statCol: Column,
      lo: Column,
      hi: Column): DataFrame = {
    require(!df.columns.exists(c => c.startsWith("__zm_")),
      "input must not contain reserved internal columns __zm_*")
    val z = df.select(zone.as("__zm_z"), statCol.as("__zm_v"))
      .where(col("__zm_z").isNotNull && col("__zm_v").isNotNull)
      .groupBy("__zm_z")
      .agg(
        count(lit(1)).as("__zm_n"),
        min(col("__zm_v")).as("__zm_mn"),
        max(col("__zm_v")).as("__zm_mx"),
        Rollups.countIf(col("__zm_v").between(lo, hi)).as("__zm_m"))
    val scanned = col("__zm_mx") >= lo && col("__zm_mn") <= hi
    z.agg(
      count(lit(1)).as("zones_total"),
      coalesce(Rollups.countIf(scanned), lit(0L)).as("zones_scanned"),
      coalesce(sum(col("__zm_n")), lit(0L)).as("rows_total"),
      coalesce(sum(when(scanned, col("__zm_n"))), lit(0L)).as("rows_scanned"),
      coalesce(sum(col("__zm_m")), lit(0L)).as("rows_matched"))
  }
}
