package graft

import graft.operators.{Batching, Profiling, Quality, Similarity}

/** Hand-checked kernels for the capacity/eval additions: packing
  * efficiency (q143), shuffle-key skew audit (q144), Simpson token
  * concentration (q145), truncated RBO (q146). */
class CapacityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("packingEfficiency: ceil splits, padded mass, floor ppm overhead") {
    // tokens 5 / 128 / 129 at ctx 128: seqs 1+1+2 = 4, padded 512,
    // tokens 262, overhead (512-262)*1e6 // 512 = 488281, ideal ceil(262/128)=3
    val docs = Seq(5L, 128L, 129L).toDF("t")
    val got = Batching.packingEfficiency(docs, "t", Seq(128L))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((128L, 3L, 262L, 4L, 512L, 488281L, 3L)))
  }

  test("packingEfficiency: larger ctx wastes more on short docs") {
    val docs = (1 to 100).map(_ => 10L).toDF("t")
    val got = Batching.packingEfficiency(docs, "t", Seq(16L, 1024L))
      .orderBy("ctx")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val byCtx = got.map(r => r._1 -> r._6).toMap
    assert(byCtx(16L) < byCtx(1024L), s"overhead must grow with ctx: $byCtx")
    // ctx 1024: each 10-token doc pads to 1024 → overhead = 1014*100/102400
    assert(byCtx(1024L) == (1014L * 100 * 1000000L) / 102400L)
  }

  test("keySkewAudit: exact shares on a hand-built skew") {
    // key 1: 6 rows, key 2: 3 rows, key 3: 1 row → n=10, k=3, max=6
    val df = (Seq.fill(6)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)).toDF("k")
    val got = Profiling.keySkewAudit(df, "k")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((10L, 3L, 6L, 600000L, 1000000L, 3L)))
  }

  test("keySkewAudit: top-10 boundary tie-break is by key") {
    // 12 keys all count 1: top10 mass = 10/12 (keys 1..10 by tie-break)
    val df = (1L to 12L).toDF("k")
    val got = Profiling.keySkewAudit(df, "k")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == ((12L, 12L, 1L, 83333L, 833333L, 1L)))
  }

  test("simpsonConcentration: repeat-pair probability, exact ppm") {
    // src a: tokens (x x y) → repeat 2, N 3 → 2e6//6 = 333333
    // src b: all distinct → 0
    val docs = Seq(("a", "x x y"), ("b", "p q r")).toDF("src", "text")
    val got = Quality.simpsonConcentration(docs, "src", "text")
      .orderBy("grp").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 3L, 2L, 2L, 333333L), ("b", 3L, 3L, 0L, 0L)))
  }

  test("rboTruncated: identical rankings hit rbo_max, disjoint hit zero") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4), (1L, 14L, 5))
      .toDF("query_id", "neighbor_id", "rank")
    val same = Similarity.rboTruncated(a, a, depth = 5)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(same == ((1L, 1L, 2L, 3L, 4L, 5L, 930L, 930L)))
    val b = Seq((1L, 20L, 1), (1L, 21L, 2), (1L, 22L, 3), (1L, 23L, 4), (1L, 24L, 5))
      .toDF("query_id", "neighbor_id", "rank")
    val disj = Similarity.rboTruncated(a, b, depth = 5)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(disj == ((1L, 0L, 0L, 0L, 0L, 0L, 0L, 930L)))
  }

  test("rboTruncated: a top-2 swap keeps set recall but pays rank weight") {
    // same 5 items; B swaps ranks 1 and 2 → ov1 = 0, ov2..5 full
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4), (1L, 14L, 5))
      .toDF("query_id", "neighbor_id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 10L, 2), (1L, 12L, 3), (1L, 13L, 4), (1L, 14L, 5))
      .toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.rboTruncated(a, b, depth = 5)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    // ov = (0,2,3,4,5) → 0 + 120*2 + 40*3 + 15*4 + 6*5 = 450
    assert(got == ((1L, 0L, 2L, 3L, 4L, 5L, 450L, 930L)))
  }
}
