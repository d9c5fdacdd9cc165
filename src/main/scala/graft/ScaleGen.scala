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
  *    (same permutation stream for every doc in a copy): token/length/
  *    vocabulary statistics are preserved exactly, WITHIN-copy near-dup
  *    structure survives (equal-length near-dups shuffle identically), and
  *    cross-copy shingle overlap is destroyed — so LSH pair counts scale
  *    ~linearly like real corpus growth;
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

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/root/repo/bench-data/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    val shuffleUdf = udf(shuffleWords _)

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
      val t = if (i == 0) col("text") else shuffleUdf(col("text"), lit(i.toLong))
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
