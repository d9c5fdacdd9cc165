package graft

import graft.operators.{Anonymity, Dsir, SlidingDistinct, TextSearch}
import org.apache.spark.sql.functions._

/** Hand-checked kernels for the round-7 curation/governance additions:
  * bigram LM familiarity (q123), DSIR importance (q124), trailing
  * distinct (q125), k-anonymity audit (q126). */
class GovernanceOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bigramFamiliarity: coverage and familiarity are exact hand-sums") {
    // ref slice = even ids. Bigrams of doc 0: (a b), (b c), (a b) wait —
    // doc 0 "a b c a b": (a,b) (b,c) (c,a) (a,b); doc 2 "a b c": (a,b) (b,c)
    // ref model (count >= 2): (a,b) -> 3; (b,c) -> 2
    val docs = Seq(
      (0L, "a b c a b"),
      (1L, "a b x y"),
      (2L, "a b c"),
      (3L, "zz")
    ).toDF("doc_id", "text")
    val got = TextSearch.bigramFamiliarity(
      docs, "doc_id", "text", col("doc_id") % 2 === 0, minRefCount = 2L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    // doc 3 has a single token -> absent
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L))
    // doc 0: 4 bigrams, matched: (a,b)x2 + (b,c) = 3, mass = 3+3+2 = 8
    assert(got(0) == ((0L, 4L, 3L, 8L, 3.0 / 4, 8.0 / 4)))
    // doc 1: 3 bigrams, matched (a,b) = 1, mass 3
    assert(got(1) == ((1L, 3L, 1L, 3L, 1.0 / 3, 3.0 / 3)))
    // doc 2: 2 bigrams, both matched, mass 3+2
    assert(got(2) == ((2L, 2L, 2L, 5L, 1.0, 5.0 / 2)))
  }

  test("dsirImportance matches a JVM replay of the fixed-point kernel") {
    // expected values are computed by replaying the exact pipeline
    // (md5Hash60 % buckets, long-div bucket scores, per-doc mean) in
    // plain JVM code — robust to hash-bucket collisions by construction
    val corpus = Seq(
      (0L, "aa bb aa bb", true),
      (1L, "aa bb aa", true),
      (2L, "zz qq zz qq", false),
      (3L, "aa zz", false))
    val buckets = 64
    def md5h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(1, 16), 16)
    }
    val toks = corpus.flatMap { case (id, text, tgt) =>
      text.split("\\s+").map(t => (id, md5h60(t) % buckets, tgt)) }
    val score = toks.groupBy(_._2).map { case (b, rows) =>
      b -> (rows.count(_._3).toLong * 1000000L) / rows.size }
    val expected = corpus.map { case (id, text, _) =>
      val bs = text.split("\\s+").map(t => score(md5h60(t) % buckets))
      id -> (bs.sum.toDouble / bs.length, bs.sum, bs.length.toLong) }.toMap

    val docs = corpus.toDF("doc_id", "text", "is_tgt")
    val got = Dsir.importanceTopK(
      docs, "doc_id", "text", targetFilter = col("is_tgt"),
      buckets = buckets, k = 4)
      .orderBy("rank")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.length == 4)
    got.foreach { case (_, id, n, w, imp) =>
      val (eImp, eW, eN) = expected(id)
      assert((n, w, imp) == ((eN, eW, eImp)), s"doc $id")
    }
    // ranks are dense 1..4, ordered by importance desc then doc_id
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    val order = expected.toSeq.map { case (id, (imp, _, _)) => (-imp, id) }
      .sorted.map(_._2)
    assert(got.map(_._2).toSeq == order)
  }

  test("trailingDistinct: window union, range clipping, dedup") {
    val ev = Seq(
      (10L, 1L), (10L, 1L), (10L, 2L), // day 10: users 1,2
      (12L, 2L),                       // day 12: user 2
      (15L, 3L)                        // day 15: user 3
    ).toDF("d", "u")
    val got = SlidingDistinct.trailingDistinct(ev, "d", "u", windowDays = 3)
      .orderBy("day").as[(Long, Long)].collect().toSeq
    // day 10: {1,2}; 11: {1,2}; 12: {1,2}+{2}={1,2}; 13: {2}; 14: {2};
    // day 15: {3} (day-12 pair visible through 14 only); clipped at 15
    assert(got == Seq(10L -> 2L, 11L -> 2L, 12L -> 2L, 13L -> 1L,
      14L -> 1L, 15L -> 1L))
  }

  test("kAnonymityAudit: class sizes, risk flag, exact 1/n") {
    val rows = Seq(
      ("a", 1), ("a", 1), ("a", 1), // class (a,1) n=3
      ("b", 2), ("b", 2),           // class (b,2) n=2
      ("c", 3)                      // class (c,3) n=1
    ).toDF("q1", "q2")
    val got = Anonymity.kAnonymityAudit(
      rows, Seq(col("q1"), col("q2")), Seq("g1", "g2"), k = 3)
      .orderBy("g1").as[(String, Int, Long, Boolean, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 1, 3L, false, 1.0 / 3),
      ("b", 2, 2L, true, 0.5),
      ("c", 3, 1L, true, 1.0)))
  }

  test("trailingDistinctUpdate == one-shot at every split point, incl. empty sides") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((10L + rnd.nextInt(20), rnd.nextInt(8).toLong))
    val df = pairs.toDF("d", "u")
    val oneShot = SlidingDistinct.trailingDistinct(df, "d", "u", windowDays = 5)
      .orderBy("day").as[(Long, Long)].collect().toSeq
    for (cut <- Seq(10L, 13L, 20L, 27L, 30L, 40L)) {
      val got = SlidingDistinct.trailingDistinctUpdate(
        df.filter(col("d") < cut), df.filter(col("d") >= cut),
        "d", "u", windowDays = 5)
        .orderBy("day").as[(Long, Long)].collect().toSeq
      assert(got == oneShot, s"split at $cut diverged")
    }
  }

  test("containmentJoin: subsumed doc found; Jaccard-low pair still reported") {
    import graft.operators.SetSimilarity
    val small = (1 to 12).map(i => s"w$i").mkString(" ")       // 10 shingles
    val big = (1 to 40).map(i => s"w$i").mkString(" ")          // 38 shingles
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big), (3L, other)).toDF("id", "text")
    val got = SetSimilarity.containmentJoin(
      docs, "id", "text", threshold = 0.9, minSetSize = 10, shingleSize = 3)
      .as[(Long, Long, Double)].collect().toSeq
    // small's 10 shingles are all within big -> containment 1.0, while
    // Jaccard is 10/38 (far below any dedup threshold)
    assert(got == Seq((1L, 2L, 1.0)))
  }
}
