package graft

import graft.operators.{Experiment, SeqPatterns, SetCover}
import org.apache.spark.sql.functions._

/** Coverage/experimentation wave: greedy set cover, sequential trigrams,
  * CUPED readout, l-diversity. */
class CoverageOpsSpec extends SparkSpec {
  import spark.implicits._

  test("greedyMaxCoverage discounts covered items (greedy != raw top-k)") {
    // raw counts: A=6, B=6, C=3 — but after A, B only adds {7} while C
    // adds {7,8,9}, so greedy must pick C second (raw top-k would pick B);
    // C then covers everything B could add, so round 3 has no uncovered
    // rows and vanishes
    val memb = (
      (1 to 6).map(i => ("A", i.toLong)) ++
      (Seq(1, 2, 3, 4, 5, 7).map(i => ("B", i.toLong))) ++
      (Seq(7, 8, 9).map(i => ("C", i.toLong)))
    ).toDF("s", "i")
    val got = SetCover.greedyMaxCoverage(memb, "s", "i", k = 3)
      .select("round", "picked_set", "newly_covered", "cumulative_covered")
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(got == Seq((1, "A", 6L, 6L), (2, "C", 3L, 9L)))
  }

  test("greedyMaxCoverage stops when the universe is exhausted") {
    val memb = Seq(("A", 1L), ("A", 2L), ("B", 1L)).toDF("s", "i")
    val got = SetCover.greedyMaxCoverage(memb, "s", "i", k = 3)
      .select("round", "picked_set", "newly_covered")
      .as[(Int, String, Long)].collect().toSeq
    // A covers everything; B has nothing new and C doesn't exist — one row
    assert(got == Seq((1, "A", 2L)))
  }

  test("frequentTrigrams: A-priori prune kills trigrams with rare bigrams") {
    // 5 users each do a->b->c (all bigrams and the trigram hit support 5);
    // one extra user does x->b->c — trigram (x,b,c) support 1, and its
    // prefix bigram (x,b) support 1 < 5, so it must not appear
    val rows =
      (1 to 5).flatMap(u => Seq((u.toLong, 1L, "a"), (u.toLong, 2L, "b"), (u.toLong, 3L, "c"))) ++
      Seq((9L, 1L, "x"), (9L, 2L, "b"), (9L, 3L, "c"))
    val df = rows.toDF("u", "pos", "t")
    val got = SeqPatterns.frequentTrigrams(df, "u", Seq(col("pos")), "t", minSupport = 5L)
      .select("t1", "t2", "t3", "support", "n_occurrences")
      .as[(String, String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", "b", "c", 5L, 5L)))
  }

  test("cupedReadout: a fully-explaining covariate equalizes group means") {
    // y == x exactly -> theta = 1 and every group's adjusted mean collapses
    // to the pooled pre-period mean
    val perUser = Seq(
      (0L, 100L, 100L), (0L, 300L, 300L),   // group 0: mean 2.00
      (1L, 500L, 500L), (1L, 700L, 700L)    // group 1: mean 6.00
    ).toDF("grp", "xc", "yc")
    val got = Experiment.cupedReadout(perUser, "grp", "xc", "yc")
      .orderBy("grp")
      .select("grp", "n_users", "mean_pre", "mean_post", "mean_adjusted", "theta")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    assert(got.length == 2)
    got.foreach { case (_, n, pre, post, adj, theta) =>
      assert(n == 2L && theta == 1.0 && pre == post)
      assert(adj == 4.0, s"adjusted must be the pooled mean 4.0, got $adj")
    }
  }

  test("cupedReadout leaves means unadjusted when theta is 0") {
    // x constant -> Var(x)=0 ... avoid 0/0: make x vary but uncorrelated
    // symmetric so Cov=0: x=(1,3,1,3), y=(10,10,20,20)
    val perUser = Seq(
      (0L, 100L, 1000L), (0L, 300L, 1000L),
      (1L, 100L, 2000L), (1L, 300L, 2000L)
    ).toDF("grp", "xc", "yc")
    val got = Experiment.cupedReadout(perUser, "grp", "xc", "yc")
      .orderBy("grp").select("mean_post", "mean_adjusted", "theta")
      .as[(Double, Double, Double)].collect()
    got.foreach { case (post, adj, theta) =>
      assert(theta == 0.0 && adj == post)
    }
  }

  test("q179 l-diversity invariants on the real table") {
    val got = SparkEntry.queries("q179_l_diversity")(spark, "/root/testdata/sf0.001")
      .select("n", "l_distinct", "top_share", "at_risk")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(got.nonEmpty)
    got.foreach { case (n, l, share, risk) =>
      assert(l >= 1 && l <= n)
      assert(share > 0.0 && share <= 1.0)
      assert(risk == (l < 2))
      assert(share >= 1.0 / l.toDouble - 1e-12)
    }
  }
}
