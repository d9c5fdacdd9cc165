package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-proof data generator: replicates the driver's sf0.1 tables `N`×
  * (default 10 → an sf1.0-equivalent volume) so [[Bench]] can measure how
  * the heavy operator family actually scales, instead of arguing it from
  * plan shapes.
  *
  * Replication is key-shifted and content-decorrelated so each copy behaves
  * like independent data rather than 10 exact duplicates (exact duplicates
  * would blow up the dedup family's pair harvest superlinearly and measure
  * an artifact, not scaling):
  *
  *  - fact keys (orderkey, doc_id, vec_id, event_id, user_id) shift by a
  *    per-copy offset — sessionization/SCD2/as-of see 10× users, each with
  *    the original per-user timeline;
  *  - document text for copy i > 0 is word-shuffled with a per-copy seed
  *    (same permutation stream for every doc in a copy) AND its tokens
  *    are VOCABULARY-CARVED per copy ([[carveToken]]: a copy-keyed
  *    substitution on letters/digits plus a character rotation — length,
  *    case pattern and punctuation preserved exactly): within-copy
  *    near-dup structure survives (a uniform per-copy bijection keeps
  *    equal shingles equal), token/length statistics match the source,
  *    and copy i's token SURFACE FORMS are disjoint from copy j's — the
  *    text twin of the media key-space block carve. Before the carve the
  *    replica multiplied rows over ONE fixed vocabulary, so every
  *    token-frequency-driven harvest (q113's prefix-join candidate mass
  *    sum(df²), q18's shingle DF) densified ~quadratically and measured
  *    a replica artifact, not scaling; with one vocabulary slice per
  *    copy those masses grow ~linearly like a real corpus's. (Real
  *    vocabulary growth is Heaps-sublinear — V ∝ N^~0.5 — with stopword
  *    df growing linearly, so fixed-vocab and carved replicas bracket
  *    reality from the dense and sparse sides; the carved side is the
  *    one whose harvests a fixed-key-space artifact cannot dominate.
  *    Corollary, stated honestly: fixed-keyword classifiers and
  *    stopword-ratio gates match ~only copy 0's text — their per-row
  *    scan work is unchanged, but match-dependent downstream work reads
  *    ~copy-0-sized.);
  *  - embeddings rotate by i positions (norm-preserving, decorrelates
  *    cross-copy cosine) — ANN/near-dup bucket topology scales naturally;
  *  - the PART dimension scales WITH the fact copies: copy i's lineitem
  *    shifts `l_partkey` by the same per-copy offset as a replicated part
  *    table's `p_partkey`, so dim joins still resolve AND the co-purchase
  *    graph family (part-part / order-part projections of lineitem) keeps
  *    realistic per-part degrees — a fixed part catalog under 10× the
  *    orders densified those graphs superlinearly and every graph-family
  *    ratio measured the densification artifact, not the operator;
  *  - the remaining dimensions (region/nation/customer/supplier) copy
  *    through unchanged so their joins still resolve;
  *  - the MEDIA key spaces scale through the documents offset itself:
  *    [[graft.multimodal.Multimodal]]'s fixture laws carve their key
  *    space per 1M-id block ([[graft.multimodal.Multimodal.mediaBlock]],
  *    span == this generator's per-copy document offset) — 53 audio
  *    tracks and one pixel-law class per block — so copy `i`'s media rows
  *    are NEW tracks / pixel classes, not byte-identical re-encodes of
  *    copy 0's, and the multimodal dedup family's replica ratios measure
  *    real key-space growth (53 -> 530 distinct PCM streams, ~10x the
  *    image/video fingerprint classes at 10 copies).
  *
  * Usage: `runMain graft.ScaleGen [srcDir] [outDir] [copies]`; defaults
  * `/root/testdata/sf0.1 → /root/repo/bench-data/sf1 × 10`.
  */
object ScaleGen {

  val KeyOffset = 1000000000L
  val PartOffset = 1000000L

  def shuffleWords(text: String, seed: Long): String = {
    if (text == null) return null
    val w = text.split(" ")
    val rnd = new scala.util.Random(seed)
    var i = w.length - 1
    while (i > 0) {
      val j = rnd.nextInt(i + 1)
      val t = w(i); w(i) = w(j); w(j) = t
      i -= 1
    }
    w.mkString(" ")
  }

  /** Per-copy vocabulary carve: map a token to copy `c`'s vocabulary
    * slice by a copy-keyed character substitution (Caesar shift c mod 26
    * on letters, shift c mod 10 on digits) composed with a right
    * rotation of the token by (c div 26) characters. Length, case
    * pattern, and punctuation are preserved EXACTLY (token/length/
    * whitespace statistics match the source corpus), the map is a
    * bijection applied uniformly within a copy (equal tokens — and
    * therefore equal shingles — stay equal within the copy). A token of
    * length L has 26·L distinct transforms, so tokens of length ≥ 4 are
    * fully disjoint across even the 100-copy sf10 replica; 1–3-char
    * tokens collide only between copies ≥ 26·L apart (at most
    * ceil(copies/26L) copies share a form — shared-df mass bounded by a
    * small constant times one copy's, never the all-copies pile-up that
    * made the fixed-vocab replica's sum(df²) quadratic). Pure-punctuation
    * tokens are fixed points — negligible df mass. Copy 0 is the
    * identity, so base-sf results never change. */
  def carveToken(tok: String, copy: Int): String = {
    if (copy == 0 || tok.isEmpty) return tok
    val shift = copy % 26
    val dshift = copy % 10
    val arr = tok.toCharArray
    var i = 0
    while (i < arr.length) {
      val c = arr(i)
      if (c >= 'a' && c <= 'z') arr(i) = ('a' + (c - 'a' + shift) % 26).toChar
      else if (c >= 'A' && c <= 'Z') arr(i) = ('A' + (c - 'A' + shift) % 26).toChar
      else if (c >= '0' && c <= '9') arr(i) = ('0' + (c - '0' + dshift) % 10).toChar
      i += 1
    }
    val rot = (copy / 26) % arr.length
    if (rot == 0) new String(arr)
    else new String(arr, arr.length - rot, rot) + new String(arr, 0, arr.length - rot)
  }

  /** The full per-copy text decorrelation: word shuffle (per-copy
    * permutation stream) + vocabulary carve (per-copy token slice). */
  def decorrelateText(text: String, copy: Int): String = {
    if (text == null) return null
    if (copy == 0) return text
    shuffleWords(text, copy.toLong).split(" ")
      .map(carveToken(_, copy)).mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/root/repo/bench-data/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    val decorrelateUdf = udf(decorrelateText _)

    def replicate(name: String)(tx: (DataFrame, Int) => DataFrame): Unit = {
      val src = Tables.table(spark, srcDir, name)
      val out = (0 until copies).map(i => tx(src, i)).reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scalegen] $name x$copies -> $outDir")
    }

    replicate("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * KeyOffset))
        .withColumn("l_partkey", col("l_partkey") + lit(i * PartOffset))
    }
    replicate("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * KeyOffset))
    }
    replicate("documents") { (df, i) =>
      val t = if (i == 0) col("text") else decorrelateUdf(col("text"), lit(i))
      df.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
        .withColumn("text", t)
    }
    replicate("embeddings") { (df, i) =>
      // rotation only yields dim-1 distinct non-trivial shifts; for copy
      // counts past the dimension, compose with a norm-preserving global
      // sign flip so no two copies are identical (both transforms preserve
      // norms and pairwise-decorrelate cross-copy cosine)
      val rot = i % 64
      val rotated = if (rot == 0) col("embedding")
        else expr(s"concat(slice(embedding, ${rot + 1}, size(embedding) - $rot), slice(embedding, 1, $rot))")
      val e = if (i == 0) col("embedding")
        else if ((i / 64) % 2 == 1) expr(s"transform(${if (rot == 0) "embedding"
          else s"concat(slice(embedding, ${rot + 1}, size(embedding) - $rot), slice(embedding, 1, $rot))"}, x -> -x)")
        else rotated
      df.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
        .withColumn("embedding", e)
    }
    replicate("events") { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * KeyOffset))
        .withColumn("user_id", col("user_id") + lit(i * 10000000L))
    }
    replicate("part") { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * PartOffset))
    }
    for (dim <- Seq("region", "nation", "customer", "supplier"))
      replicate(dim)((df, i) => if (i == 0) df else df.limit(0))

    spark.stop()
  }
}
