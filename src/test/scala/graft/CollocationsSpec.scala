package graft

import graft.operators.TextSearch
import org.apache.spark.sql.functions._

/** Lift-ranked bigram collocations: exact counts, exact arithmetic. */
class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "new york is big and new york is old",
    "i saw new york once",
    "the cat sat on the mat and the cat ran",
    "x"
  ).toDF("text")

  test("counts and lift are exact") {
    val got = TextSearch.collocationsByLift(docs, "text", minCount = 3L, k = 10)
      .as[(String, String, Long, Double)].collect()
    // corpus: N = 9 + 5 + 10 + 1 = 25 tokens, M = 8 + 4 + 9 + 0 = 21 bigrams
    // "new york" x3: c_new=3, c_york=3 -> lift = 3*25*25/(21*3*3) = 1875/189
    // "the cat" x2 below minCount; no other pair reaches 3
    assert(got.length == 1)
    val (x, y, c, lift) = got.head
    assert((x, y, c) == ("new", "york", 3L))
    assert(lift == 3.0 * 25 * 25 / (21.0 * 3 * 3))
  }

  test("minCount prunes before ranking; k caps output") {
    val got = TextSearch.collocationsByLift(docs, "text", minCount = 2L, k = 2)
      .as[(String, String, Long, Double)].collect()
    assert(got.length == 2)
    // (new,york) c=3, (the,cat) c=2, (york,is) c=2 all land on lift 625/63
    // exactly (IEEE division of equal rationals is bit-identical), so the
    // (x, y) tiebreak decides: new < the < york
    assert(got.map(r => (r._1, r._2)).toSeq ==
      Seq(("new", "york"), ("the", "cat")))
  }

  test("deterministic tiebreak on (lift, x, y)") {
    val tied = Seq("a b c a b", "d e f d e").toDF("text")
    val got = TextSearch.collocationsByLift(tied, "text", minCount = 2L, k = 10)
      .select("x", "y").as[(String, String)].collect().toSeq
    assert(got.size == got.toSet.size)
  }

  test("skip-gram pairs cover the window, orientation-normalized, exact counts") {
    val d = Seq("b a c a").toDF("text")
    // window 2, positions: (b,a) (b,c) (a,c) (a,a) (c,a) -> normalized:
    // (a,b)x1 (b,c)x1 (a,c)x2 (a,a)x1; N=4 tokens, M=5 pairs
    val got = TextSearch.skipgramByLift(d, "text", window = 2, minCount = 1L, k = 10)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.keySet == Set(("a", "b"), ("b", "c"), ("a", "c"), ("a", "a")))
    assert(got(("a", "c"))._1 == 2L)
    // c_a=2, c_c=1: lift(a,c) = 2*16/(5*2*1)
    assert(got(("a", "c"))._2 == 2.0 * 4 * 4 / (5.0 * 2 * 1))
    // self-pair (a,a): c_xy=1, lift = 1*16/(5*2*2)
    assert(got(("a", "a"))._2 == 1.0 * 4 * 4 / (5.0 * 2 * 2))
  }

  test("window 1 skip-gram == adjacent collocations up to orientation") {
    val d = Seq("x y z x y", "p q p q").toDF("text")
    val sg = TextSearch.skipgramByLift(d, "text", window = 1, minCount = 1L, k = 100)
      .select("x", "y", "c_xy").as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val ad = TextSearch.collocationsByLift(d, "text", minCount = 1L, k = 100)
      .select("x", "y", "c_xy").as[(String, String, Long)].collect()
    val folded = ad.groupBy { case (a, b, _) =>
      if (a <= b) (a, b) else (b, a)
    }.map { case (k2, vs) => k2 -> vs.map(_._3).sum }
    assert(sg == folded)
  }
}
