package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data preparation: document chunking and sequence packing — the
  * two reshaping passes between a cleaned corpus and a token-budgeted
  * training set.
  *
  * 100 TB posture: chunking is a per-row explode (no shuffle at all —
  * chunks inherit the scan's partitioning); packing is one window pass per
  * pack key. Token counts use the whitespace tokenizer shared with the
  * text-analysis family (`q13_token_stats`); swap in a BPE count column
  * upstream when available — both operators take the count as data, not a
  * hardcoded tokenizer.
  */
object Chunking {

  /** Rolling-hash base for CDC window hashes (prime; p31 · RollBase < 2^51,
    * so Horner accumulation never overflows signed 64-bit). Part of the
    * persisted chunk-boundary format — fixed for all time. */
  val RollBase = 1000003L

  /** Split each document into token windows of `chunkSize` with `overlap`
    * tokens carried between consecutive chunks (stride = chunkSize -
    * overlap). Output: (idCol, chunk_idx, chunk_text, n_tokens); documents
    * shorter than one chunk yield chunk 0 whole. Pure projection + explode:
    * zero shuffles, chunk order deterministic. */
  def chunkByTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got overlap=$overlap chunkSize=$chunkSize")
    val stride = chunkSize - overlap
    val toks = split(trim(col(textCol)), "\\s+")
    // number of chunks: ceil(max(n - overlap, 1) / stride)
    val n = size(toks)
    val nChunks = greatest(ceil((n - overlap).cast("double") / stride), lit(1.0))
      .cast("int")
    docs.select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        array_join(
          slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkSize)), " ")
          .as("chunk_text"),
        least(size(col("__toks")) - col("chunk_idx") * stride, lit(chunkSize))
          .as("n_tokens"))
  }

  /** Content-defined chunking (CDC, the rsync/LBFS rolling-boundary
    * trick): a chunk boundary falls AFTER token position `i` wherever the
    * hash of the trailing `windowTokens`-token window is ≡ 0 mod
    * `divisor` — so boundaries are anchored to CONTENT, not offsets, and
    * an insertion early in a document shifts only the chunk it lands in,
    * leaving every later chunk hash identical (the property that makes
    * chunk-level dedup robust to edits; fixed-stride chunking loses all
    * alignment after one insertion). Expected chunk length ≈ `divisor`
    * tokens.
    *
    * Returns one row per chunk: `(id, chunk_idx, start_pos, n_tokens,
    * chunk_hash)` with `start_pos` 1-based and `chunk_hash` the portable
    * hash of the chunk text (the dedup key).
    *
    * Scale shape: boundary detection, chunk assembly, and hashing are all
    * in-row higher-order functions over the token array — the ONLY plan
    * node added over the scan is the final explode (zero shuffles, the
    * q49 posture). The boundary hash is a ROLLING polynomial (CDC's
    * classic trick): each token is md5-hashed ONCE (`md5Hash60 mod p31`),
    * then every w-token window hash is a Horner fold of those per-token
    * longs (base [[RollBase]] mod p31) built from w-1 `zip_with` passes
    * over shifted slices — integer-only per window, no per-position
    * string assembly or md5. (The first formulation md5-hashed every
    * window's joined text: one md5 + slice + join allocation per token
    * position, ~10x this version's cost, dominating the whole bench.)
    * Chunk hashes stay [[graft.functions.PortableHash.md5Hash60]] of the
    * chunk text (one per ~divisor tokens); the whole pass replays in the
    * SQL oracle. */
  def cdcChunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 4,
      divisor: Int = 64): DataFrame = {
    require(windowTokens > 0 && divisor > 0, "windowTokens and divisor must be positive")
    import graft.functions.{PortableHash => PH}
    val w = windowTokens
    val base = docs.select(col(idCol).as("id"),
      split(trim(lower(col(textCol))), "\\s+").as("t"))
      .withColumn("n", size(col("t")))
      // one md5 per token, reduced mod p31 so Horner products stay < 2^51
      .withColumn("th", transform(col("t"), tok =>
        pmod(PH.md5Hash60(tok), lit(PH.P31))))
    // window hashes: Horner fold over w shifted views of th; windows(k0),
    // 0-based, covers tokens k0+1 .. k0+w
    val m = col("n") - (w - 1)
    val windows = (1 until w).foldLeft(slice(col("th"), lit(1), m)) { (acc, k) =>
      zip_with(acc, slice(col("th"), lit(k + 1), m),
        (a, b) => pmod(a * RollBase + b, lit(PH.P31)))
    }
    val bounds = base.withColumn("bpos",
      when(col("n") >= w,
        filter(
          transform(windows, (h, k0) =>
            when(pmod(h, lit(divisor.toLong)) === 0L, k0 + w).otherwise(lit(-1))),
          x => x =!= -1))
        .otherwise(array().cast("array<int>")))
    val spans = bounds
      .withColumn("ss", concat(array(lit(1)), transform(col("bpos"), b => b + 1)))
      .withColumn("es", concat(col("bpos"), array(col("n"))))
      // a boundary at the last token would open an empty trailing chunk
      .withColumn("spans",
        filter(zip_with(col("ss"), col("es"), (s, e) => struct(s.as("s"), e.as("e"))),
          p => p.getField("s") <= p.getField("e")))
    spans
      .select(col("id"), col("t"),
        posexplode(col("spans")).as(Seq("chunk_idx", "p")))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("p.s").cast("long").as("start_pos"),
        (col("p.e") - col("p.s") + 1).cast("long").as("n_tokens"),
        PH.md5Hash60(
          array_join(slice(col("t"), col("p.s"), col("p.e") - col("p.s") + 1), " "))
          .as("chunk_hash"))
  }

  /** Streaming sequence packing: order documents deterministically (by
    * `orderCol` within each `packKey` partition), then assign each to the
    * bin where its cumulative token count lands: `bin = floor((cumsum -
    * tokens) / budget)` — the standard one-pass packing used by large
    * training pipelines (bins fill to ~budget; a document larger than the
    * budget gets its own bin span). One window pass per pack key; the pack
    * key (e.g. a date or shard column) bounds each window's data so no
    * global sort exists. Output: input columns + (bin, bin_offset). */
  def packSequences(
      docs: DataFrame,
      packKeys: Seq[String],
      orderCol: String,
      tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(!docs.columns.contains("__cum"), "column name __cum is reserved")
    val w = Window.partitionBy(packKeys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("bin",
        floor((col("__cum") - col(tokenCol)).cast("double") / budget).cast("long"))
      .withColumn("bin_offset", col("__cum") - col(tokenCol) - col("bin") * budget)
      .drop("__cum")
  }
}
