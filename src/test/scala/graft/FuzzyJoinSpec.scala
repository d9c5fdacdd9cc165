package graft

import graft.operators.{FuzzyJoin, Rollups, SortedNeighborhood}
import org.apache.spark.sql.functions._

/** Blocked fuzzy resolve semantics + the chi-square contingency cells. */
class FuzzyJoinSpec extends SparkSpec {

  import spark.implicits._

  test("resolves within-block best match; cross-block pairs never form") {
    val probes = Seq("widgett", "gizmo", "xylophon").toDF("p")
    val catalog = Seq("widget", "gizmos", "gadget", "xylophone", "zzz").toDF("c")
    val got = FuzzyJoin.blockedResolve(probes, "p", catalog, "c", threshold = 0.5)
      .orderBy("q").as[(String, String, Double)].collect().toSeq
    assert(got.map(r => r._1 -> r._2) ==
      Seq("gizmo" -> "gizmos", "widgett" -> "widget", "xylophon" -> "xylophone"))
    // recall caveat by construction: a typo in the block prefix hides the match
    val hidden = FuzzyJoin.blockedResolve(
      Seq("qidget").toDF("p"), "p", catalog, "c", threshold = 0.1)
    assert(hidden.count() == 0, "prefix typo must move the probe out of the block")
  }

  test("threshold gates weak matches; ties break on candidate order") {
    val got = FuzzyJoin.blockedResolve(
      Seq("ab").toDF("p"), "p", Seq("abxxxxxx", "abyyyyyy").toDF("c"), "c",
      threshold = 0.9)
    assert(got.count() == 0, "0.25 similarity must not pass a 0.9 threshold")
    val tie = FuzzyJoin.blockedResolve(
      Seq("abcd").toDF("p"), "p", Seq("abcx", "abcy").toDF("c"), "c", 0.5)
      .as[(String, String, Double)].head()
    assert(tie._2 == "abcx", "equal scores must break on candidate sort order")
  }

  test("flooded blocks drop whole, out loud, not partially") {
    val probes = Seq("aa1").toDF("p")
    val catalog = ((1 to 50).map(i => s"aa$i") :+ "bb1").toDF("c")
    val got = FuzzyJoin.blockedResolve(probes, "p", catalog, "c",
      threshold = 0.1, maxBlock = 10)
    assert(got.count() == 0, "the aa-block (50 > 10) must contribute nothing")
  }

  test("sortedNeighborhood: window pairs per block, normalized orientation") {
    import org.apache.spark.sql.functions.{col, lower, substring}
    // sort order (by name) deliberately opposes id order so least/greatest
    // normalization is exercised; block = first char keeps b's apart
    val df = Seq((4L, "aa"), (3L, "ab"), (2L, "ac"), (1L, "ad"),
      (5L, "ba"), (6L, "bb")).toDF("id", "nm")
    val got = SortedNeighborhood.candidates(
      df, "id", lower(col("nm")), substring(lower(col("nm")), 1, 1), w = 3)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((3L, 4L), (2L, 4L), (2L, 3L), (1L, 3L), (1L, 2L), (5L, 6L)))
    // identical passes union-distinct to the single-pass set
    val two = SortedNeighborhood.candidatesMultiPass(df, "id",
      Seq((lower(col("nm")), substring(lower(col("nm")), 1, 1)),
        (lower(col("nm")), substring(lower(col("nm")), 1, 1))), w = 3)
    assert(two.count() == got.size)
    // contracts: degenerate window and reserved columns fail fast
    intercept[IllegalArgumentException] {
      SortedNeighborhood.candidates(df, "id", col("nm"), col("nm"), w = 1)
    }
    intercept[IllegalArgumentException] {
      SortedNeighborhood.candidates(df.withColumn("__sn_sk", col("nm")),
        "id", col("nm"), col("nm"), w = 2)
    }
  }

  test("sortedNeighborhood: scoredPairs keeps only threshold-passing pairs") {
    val ents = Seq((1L, "abcd"), (2L, "abcx"), (3L, "zzzz")).toDF("id", "nm")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = SortedNeighborhood.scoredPairs(pairs, ents, "id", "nm", 0.6)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 0.75)), "lev 1 over max-len 4 = 0.75; zzzz filtered")
  }

  test("contingency: exact marginals; uniform table has zero contributions") {
    // 2x2 uniform: observed == expected everywhere
    val uniform = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("r", "c")
    val u = Rollups.contingency(uniform, "r", "c")
      .select("observed", "row_total", "col_total", "n", "expected", "contribution")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(u.length == 4)
    u.foreach { row =>
      assert(row == ((1L, 2L, 2L, 4L, 1.0, 0.0)), row.toString)
    }
    // skewed table: marginals stay exact integers, contributions positive
    val skew = (Seq.fill(9)(("a", "x")) ++ Seq(("a", "y"), ("b", "x"),
      ("b", "y"), ("b", "y"), ("b", "y"))).toDF("r", "c")
    val cells = Rollups.contingency(skew, "r", "c")
      .as[(String, String, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(cells(("a", "x"))._3 == 9L)
    assert(cells(("a", "x"))._4 == 10L) // row a total
    assert(cells(("a", "x"))._5 == 10L) // col x total
    assert(cells(("a", "x"))._6 == 14L)
    val e = (10L * 10L).toDouble / 14.0
    assert(cells(("a", "x"))._7 == e)
    assert(cells(("a", "x"))._8 == (9.0 - e) * (9.0 - e) / e)
  }
}
