package graft

import graft.operators.{Profiling, Quality}
import org.apache.spark.sql.functions._

/** Percentile normalization (q164) and Zipf segmentation (q165) kernels. */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("percentileNormalize: midrank ties, floor ppm") {
    val df = Seq(("k", 10L, 1L), ("k", 20L, 2L), ("k", 20L, 3L), ("k", 30L, 4L))
      .toDF("src", "v", "id")
    val got = Profiling.percentileNormalize(df, "src", "v", "id")
      .select("id", "pct_ppm").as[(Long, Long)].collect().toMap
    // n=4: v=10 -> (2*0+1+1)/8 = 250000; v=20 -> (2*1+2+1)/8 = 625000;
    // v=30 -> (2*3+1+1)/8 = 1000000
    assert(got == Map(1L -> 250000L, 2L -> 625000L, 3L -> 625000L, 4L -> 1000000L))
  }

  test("percentileNormalize: per-source, order-preserving, bounded") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Profiling.percentileNormalize(
      docs.select(col("doc_id"), col("source"), col("n_chars")),
      "source", "n_chars", "doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(got.length == docs.count())
    for ((src, rows) <- got.groupBy(_._2)) {
      val vs = rows.map(_._3)
      val n = vs.length.toLong
      for ((id, _, v, ppm) <- rows) {
        val a = vs.count(_ < v).toLong
        val c = vs.count(_ == v).toLong
        // midrank ppm, exactly — a tied maximum sits BELOW 1e6
        assert(ppm == (2 * a + c + 1) * 1000000L / (2 * n), s"$src doc $id")
      }
    }
  }

  test("zipfSegments: hand corpus hits all three segments") {
    // term freqs: a=50 (head), b1..b9=5 each (middle), c1..c5=1 (tail); M=100
    val text = (Seq.fill(50)("a") ++
      (1 to 9).flatMap(i => Seq.fill(5)(s"b$i")) ++
      (1 to 5).map(i => s"c$i")).mkString(" ")
    val got = Quality.zipfSegments(Seq(text).toDF("text"), "text")
      .orderBy("segment")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("1_head", 1L, 1L, 50L, 500000L, 50L, 50L),
      ("2_middle", 1L, 9L, 45L, 450000L, 5L, 5L),
      ("3_tail", 1L, 5L, 5L, 50000L, 1L, 1L)))
  }

  test("zipfSegments: whole levels never split; masses sum to the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Quality.zipfSegments(docs, "text")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val totalTokens = docs
      .select(size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("n"))
      .agg(sum("n")).as[Long].head()
    assert(got.map(_._4).sum == totalTokens)
    assert(got.map(_._5).sum >= 999998L && got.map(_._5).sum <= 1000000L)
    // frequency ranges of the segments are disjoint and ordered
    val bySeg = got.sortBy(_._1)
    for (Seq(hi, lo) <- bySeg.map(r => (r._6, r._7)).sliding(2).map(_.toSeq))
      assert(hi._1 > lo._2, s"segment freq ranges overlap: $bySeg")
  }
}
