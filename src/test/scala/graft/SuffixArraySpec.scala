package graft

import graft.operators.{Dedup, SuffixArray}
import org.apache.spark.sql.functions._

/** Prefix-doubling exact dup spans vs the md5-60 window screen: two
  * disjoint algorithms, identical cut lists. */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // 1 & 2 share a 10-token run (positions 3-12 in 1, 1-10 in 2)
    (1L, "aa bb one two three four five six seven eight nine ten zz"),
    (2L, "one two three four five six seven eight nine ten qq rr ss"),
    // 3 repeats an 8-token run WITHIN itself only -> not cross-doc dup
    (3L, "p1 p2 p3 p4 p5 p6 p7 p8 mid p1 p2 p3 p4 p5 p6 p7 p8 end"),
    // 4 & 5: two separate shared runs with a gap -> two islands each
    (4L, "s1 s2 s3 s4 s5 s6 s7 s8 gapA gapB t1 t2 t3 t4 t5 t6 t7 t8"),
    (5L, "s1 s2 s3 s4 s5 s6 s7 s8 gapC gapD t1 t2 t3 t4 t5 t6 t7 t8"),
    (6L, "too short for a window"),
    (7L, "entirely novel content with no duplicated runs at all here okay")
  ).toDF("doc_id", "text")

  private def ranges(w: Int) =
    SuffixArray.exactDupSpanRanges(docs, "doc_id", "text", w)
      .select(col("id"), col("span_start"), col("span_end"), col("span_tokens"))
      .as[(Long, Long, Long, Long)].collect().toSet

  private def hashRanges(w: Int) =
    Dedup.duplicatedSpanRanges(docs, "doc_id", "text", w)
      .select(col("id"), col("span_start"), col("span_end"), col("span_tokens"))
      .as[(Long, Long, Long, Long)].collect().toSet

  test("matches the hash-screen ranges, power-of-two and not") {
    for (w <- Seq(2, 3, 5, 8))
      assert(ranges(w) == hashRanges(w), s"windowTokens $w")
  }

  test("exact expected ranges at w=8") {
    assert(ranges(8) == Set(
      (1L, 3L, 12L, 10L), (2L, 1L, 10L, 10L),
      (4L, 1L, 8L, 8L), (4L, 11L, 18L, 8L),
      (5L, 1L, 8L, 8L), (5L, 11L, 18L, 8L)))
  }

  test("within-doc-only repeats are not cross-document duplicates") {
    assert(!ranges(8).exists(_._1 == 3L))
  }

  test("maxDupSubstring: exact longest cross-doc duplicated run lengths") {
    val got = SuffixArray.maxDupSubstring(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    // 1&2 share a 10-run; 4&5 share two 8-runs (gaps differ, so never 9+);
    // 3's repeat is within-doc only; 6/7 share no token with anyone
    assert(got == Map(1L -> 10L, 2L -> 10L, 3L -> 0L,
      4L -> 8L, 5L -> 8L, 6L -> 0L, 7L -> 0L))
  }

  test("maxDupSubstring matches the all-grams brute force on sf0.001 subset") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 40)
    val got = SuffixArray.maxDupSubstring(real, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val toks = real.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect()
      .map { case (id, t) => id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val grams = scala.collection.mutable.Map
      .empty[(Int, Seq[String]), scala.collection.mutable.Set[Long]]
    for ((id, w) <- toks; l <- 1 to w.length; s <- 0 to w.length - l)
      grams.getOrElseUpdate((l, w.slice(s, s + l)),
        scala.collection.mutable.Set.empty[Long]) += id
    val best = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (((l, _), ids) <- grams if ids.size >= 2; id <- ids)
      best(id) = math.max(best(id), l.toLong)
    val want = toks.map(_._1).map(id => id -> best(id)).toMap
    assert(got == want && want.values.exists(_ > 0))
  }

  test("maxDupSubstring: r12 internals — heavy ties across partitions, " +
      "unique-rank early exit, identical-to-end tails") {
    // One shared token flooding every doc forces rank-0 key groups to span
    // many partitions (the scanRanks boundary-merge path); docs 20/21 are
    // identical END-TO-END (the fixed-point/padded-tail clamp path); docs
    // 22/23 share a run whose length is NOT a multiple of 4 (base-4 digit
    // decomposition); 24 is all-unique (early-exit, best 0 via shared "zz"
    // only at length 1... kept distinct so best = 0).
    val docs = (
      (0L until 20L).map(i => (i, Seq.fill(30)("zz").mkString(" "))) ++ Seq(
        (20L, "u1 u2 c1 c2 c3 c4 c5 c6 c7"),
        (21L, "v1 c1 c2 c3 c4 c5 c6 c7"),
        (22L, "w1 d1 d2 d3 d4 d5 d6 w2 w3"),
        (23L, "x1 x2 d1 d2 d3 d4 d5 d6 x3"),
        (24L, "a1 a2 a3 a4 a5 a6 a7 a8 a9"))
      ).toDF("doc_id", "text")
    val got = SuffixArray.maxDupSubstring(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    // brute force over all grams
    val toks = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val grams = scala.collection.mutable.Map
      .empty[Seq[String], scala.collection.mutable.Set[Long]]
    for ((id, w) <- toks; l <- 1 to w.length; s <- 0 to w.length - l)
      grams.getOrElseUpdate(w.slice(s, s + l),
        scala.collection.mutable.Set.empty[Long]) += id
    val best = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((g, ids) <- grams if ids.size >= 2; id <- ids)
      best(id) = math.max(best(id), g.length.toLong)
    assert(got == toks.map(_._1).map(id => id -> best(id)).toMap)
    assert(got(20L) == 7L && got(22L) == 6L && got(24L) == 0L)
  }

  test("matches the hash screen on the sf0.001 documents table") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val sa = SuffixArray.exactDupSpanRanges(real, "doc_id", "text", 8)
      .select("id", "span_start", "span_end").as[(Long, Long, Long)]
      .collect().toSet
    val h = Dedup.duplicatedSpanRanges(real, "doc_id", "text", 8)
      .select("id", "span_start", "span_end").as[(Long, Long, Long)]
      .collect().toSet
    assert(sa == h)
    assert(sa.nonEmpty) // the synthetic corpus does contain duplicated runs
  }
}
