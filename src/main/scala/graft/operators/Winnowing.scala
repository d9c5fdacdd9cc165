package graft.operators

import graft.functions.{PortableHash => PH}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD'03 — the MOSS scheme): hash every token k-gram, slide a window
  * of `w` consecutive gram hashes over the document, and in each window
  * select the MINIMUM hash (ties → rightmost position). The distinct
  * selected positions are the document's fingerprints: any shared
  * substring of at least k + w − 1 tokens is GUARANTEED to contribute at
  * least one common fingerprint (the winnowing guarantee), while the
  * expected fingerprint density is only 2/(w+1) of the grams — the
  * sub-sampling that makes all-pairs overlap detection affordable where
  * the full k-gram table (q68's span screen) is corpus-sized.
  *
  * Reference analogue: the reference dedupes articles by exact URL/title
  * identity (`scripts/build-database.py` merge keys); winnowing is the
  * content-level fingerprint a 100 TB corpus needs when near-identical
  * bodies arrive under distinct URLs.
  *
  * Engine-portable arithmetic: gram hashes are [[PH.md5Hash60]] over the
  * space-joined token k-gram (the q68 family's hashing convention, DuckDB
  * `md5`-replayable). The rightmost-min selection is ONE windowed `min`
  * over the encoding `hash·10⁹ + (10⁹−1−pos)` in decimal(38,0): the
  * lexicographic (hash asc, pos desc) order collapses into a single
  * integer key (hash < 2⁶⁰, so the product is < 1.2e27 ≪ 1e38; positions
  * up to 10⁹−1 tokens per document — a 4 GB document — before the
  * encoding would need widening). HUGEINT replays it exactly.
  *
  * Scale shape: one exchange partitions grams by document for the
  * selection window (per-document work, bounded by document length —
  * never corpus-global); the distinct that collapses selected positions
  * runs on the already-doc-partitioned stream. No joins, no driver
  * collection; the fingerprint table is the ~2/(w+1)-sampled output
  * other operators join on.
  *
  * Returns the fingerprint table `(id, fp_pos, fp_hash)` — one row per
  * selected gram position, `fp_hash` the 60-bit gram hash. */
object Winnowing {

  private val Pad = 1000000000L // position padding base: 10^9

  def fingerprints(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      w: Int): DataFrame = {
    require(k >= 1 && w >= 1, "need positive k-gram size and window")
    require(!docs.columns.exists(Set("__t", "__p", "__h", "__mc", "__j", "__g")),
      "docs must not contain reserved internal columns")
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val grams = docs
      .select(col(idCol).as("id"), toks.as("__t"))
      .filter(size(col("__t")) >= k)
      .select(col("id"),
        explode(sequence(lit(1), size(col("__t")) - (k - 1))).as("__p"),
        col("__t"))
      .select(col("id"), col("__p"),
        PH.md5Hash60(array_join(slice(col("__t"), col("__p"), lit(k)), " "))
          .as("__h"))
    // window start j covers gram positions [j, j+w-1]; starts past
    // G-w+1 would see a truncated frame, so they are dropped — except a
    // document with fewer than w grams winnows its whole gram sequence
    // (j = 1 only), the paper's short-document convention.
    val sel = Window.partitionBy("id").orderBy("__p")
    val selected = grams
      .withColumn("__mc",
        min(dec(col("__h")) * lit(Pad) + dec(lit(Pad - 1L) - col("__p")))
          .over(sel.rowsBetween(0, w - 1)))
      .withColumn("__j", row_number().over(sel))
      .withColumn("__g", count(lit(1)).over(Window.partitionBy("id")))
      .filter(col("__j") <= greatest(col("__g") - (w - 1), lit(1)))
    selected
      .select(col("id"), col("__mc")).distinct()
      .select(col("id"),
        (lit(Pad - 1L) - pmod(col("__mc"), dec(lit(Pad)))).cast("long").as("fp_pos"),
        ((col("__mc") - pmod(col("__mc"), dec(lit(Pad)))) / dec(lit(Pad)))
          .cast("long").as("fp_hash"))
  }

  /** Fingerprint-density audit per group: total grams vs selected
    * fingerprints and the floor-ppm density — the empirical check of the
    * 2/(w+1) expectation (a density far above it means adversarially
    * ordered hashes or tiny documents; far below means hash collisions).
    * Two map-side-combined rollups over [[fingerprints]] and the gram
    * counts; no joins beyond the |groups|-row broadcast. */
  def densityByGroup(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      textCol: String,
      k: Int,
      w: Int): DataFrame = {
    def floorDiv(a: Column, b: Column) = ((a - pmod(a, b)) / b).cast("long")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val gramCounts = docs
      .select(col(groupCol).as("grp"),
        greatest(size(toks) - (k - 1), lit(0)).cast("long").as("__ng"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_docs"), sum(col("__ng")).as("n_grams"))
    val fpCounts = fingerprints(docs, idCol, textCol, k, w)
      .join(docs.select(col(idCol).as("id"), col(groupCol).as("grp")), "id")
      .groupBy("grp")
      .agg(count(lit(1)).as("n_fp"))
    gramCounts.join(fpCounts, Seq("grp"), "left")
      .select(col("grp"), col("n_docs"), col("n_grams"),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"))
      .withColumn("density_ppm",
        when(col("n_grams") > 0L,
          floorDiv(col("n_fp") * lit(1000000L), col("n_grams"))))
  }

  /** Winnow dup candidates: document pairs sharing at least `minShared`
    * distinct fingerprint HASHES, with the shared count and the
    * containment ppm against the smaller document's fingerprint set —
    * the MOSS similarity screen. By the winnowing guarantee every pair
    * sharing a (k+w−1)-token substring surfaces here, at fingerprint
    * (≈ 2/(w+1)-sampled) cost instead of gram cost.
    *
    * Scale shape: pairs form by self-joining the distinct (id, hash)
    * grain on hash — the minhash-band discipline (`operators/Dedup`):
    * fan-out per hash is its document frequency, and `maxBucket` drops
    * degenerate boilerplate hashes (a fingerprint shared by thousands of
    * documents identifies a template, not a dup pair — flood-cap it out,
    * loudly, as its own diagnostic row upstream). Per-doc fingerprint
    * sizes broadcast back for the containment ratio. */
  def dupCandidates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      w: Int,
      minShared: Int,
      maxBucket: Int = 1000): DataFrame = {
    def floorDiv(a: Column, b: Column) = ((a - pmod(a, b)) / b).cast("long")
    val fp = fingerprints(docs, idCol, textCol, k, w)
      .select(col("id"), col("fp_hash")).distinct()
    val sizes = fp.groupBy("id").agg(count(lit(1)).as("__n"))
    val capped = fp
      .withColumn("__df", count(lit(1)).over(Window.partitionBy("fp_hash")))
      .filter(col("__df") <= maxBucket)
      .select("id", "fp_hash")
    val pairs = capped.toDF("__a", "fp_hash")
      .join(capped.toDF("__b", "fp_hash2"),
        col("fp_hash") === col("fp_hash2") && col("__a") < col("__b"))
      .groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    // sizes is doc-grain (corpus-sized) — never force-broadcast it; the
    // surviving pair table is the small side, so AQE's runtime stats pick
    // the broadcast direction per run
    pairs
      .join(sizes.toDF("__a", "__na"), "__a")
      .join(sizes.toDF("__b", "__nb"), "__b")
      .select(col("__a").as("doc_a"), col("__b").as("doc_b"),
        col("n_shared"),
        floorDiv(col("n_shared") * lit(1000000L),
          least(col("__na"), col("__nb"))).as("containment_ppm"))
  }
}
