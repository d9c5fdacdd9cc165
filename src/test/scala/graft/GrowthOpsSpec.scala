package graft

import graft.operators.Growth
import org.apache.spark.sql.functions._

/** Product-analytics wave: growth accounting, stickiness, rare
  * transitions, SRM. */
class GrowthOpsSpec extends SparkSpec {
  import spark.implicits._

  test("growth accounting: states and churn attribution on a hand fixture") {
    // A: weeks 0,1,3  -> new@0, retained@1, churned@2, resurrected@3
    // B: week 1 only  -> new@1, churned@2
    // week 3 is the max: A's trailing silence after 3 is NOT churned
    val act = Seq(("A", 0L), ("A", 1L), ("A", 3L), ("B", 1L))
      .toDF("u", "w")
    val got = Growth.accounting(act, "u", "w")
      .orderBy("period")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 1L, 0L, 0L, 0L),
      (1L, 2L, 1L, 1L, 0L, 0L),
      (2L, 0L, 0L, 0L, 0L, 2L),
      (3L, 1L, 0L, 0L, 1L, 0L)))
  }

  test("growth accounting identity holds on real events") {
    val got = SparkEntry.queries("q196_growth_accounting")(
      spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, active, nw, ret, res, _) =>
      assert(active == nw + ret + res,
        s"active must decompose exactly: $active != $nw+$ret+$res")
    }
  }

  test("stickiness: dau bounded by wau, ratio in (0, 1]") {
    val got = SparkEntry.queries("q197_stickiness")(spark, "/root/testdata/sf0.001")
      .select("dau", "wau", "stickiness").as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (dau, wau, s) =>
      assert(dau >= 1 && dau <= wau)
      assert(s == dau.toDouble / wau.toDouble && s > 0.0 && s <= 1.0)
    }
  }

  test("rare transitions: fractions well-formed, flag consistent") {
    val got = SparkEntry.queries("q195_rare_transitions")(
      spark, "/root/testdata/sf0.001")
      .select("n_bigrams", "n_rare", "rare_frac", "suspicious")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(got.nonEmpty)
    got.foreach { case (nb, nr, f, flag) =>
      assert(nr >= 0 && nr <= nb)
      assert(f == nr.toDouble / nb.toDouble)
      assert(flag == (f > 0.3))
    }
  }

  test("q199 funnel A/B: chi2 recomputes from the cells, guard sound") {
    val got = SparkEntry.queries("q199_funnel_ab")(spark, "/root/testdata/sf0.001")
      .select("n_0", "conv_0", "n_1", "conv_1", "chi2", "significant")
      .as[(Long, Long, Long, Long, Double, Boolean)].head()
    val (n0, a, n1, c, chi2, sig) = got
    val (b, d) = (n0 - a, n1 - c)
    if (a + c > 0 && b + d > 0 && n0 > 0 && n1 > 0) {
      val n = (n0 + n1).toDouble
      val num = n * math.pow(a.toDouble * d - b.toDouble * c, 2)
      val den = n0.toDouble * n1 * (a + c) * (b + d)
      assert(math.abs(chi2 - num / den) < 1e-9 * math.max(1.0, chi2))
    } else assert(chi2 == 0.0)
    assert(sig == (chi2 > 3.841458820694124))
  }

  test("q200 makespan: totals conserved, makespan bounded below") {
    val got = SparkEntry.queries("q200_makespan_balance")(
      spark, "/root/testdata/sf0.001")
      .select("strategy", "workers", "makespan", "total", "imbalance")
      .as[(String, Int, Long, Long, Double)].collect()
    assert(got.map(_._1).sorted.toSeq == Seq("hash", "sorted_rr"))
    val totals = got.map(_._4).distinct
    assert(totals.length == 1, "both strategies place the same shard mass")
    got.foreach { case (_, k, mk, tot, imb) =>
      assert(mk.toDouble >= tot.toDouble / k, "makespan >= mean load")
      assert(imb >= 1.0 - 1e-12)
    }
  }

  test("SRM: a forced imbalance flags, the chi2 is exact") {
    // 90/10 on 100 users: chi2 = (40^2/50)*2 = 64 -> flagged
    val df = ((1L to 90L).map(i => i * 2) ++ (1L to 10L).map(i => i * 2 + 1))
      .toDF("user_id")
    val arms = df.groupBy(pmod(col("user_id"), lit(2L)).as("grp"))
      .agg(count(lit(1)).as("n"))
    val n0 = arms.where(col("grp") === 0L).select("n").as[Long].head()
    assert(n0 == 90L)
    val got = SparkEntry.queries("q198_srm_check")(spark, "/root/testdata/sf0.001")
      .select("n_0", "n_1", "chi2", "srm_flag")
      .as[(Long, Long, Double, Boolean)].head()
    val exp = (got._1 + got._2).toDouble / 2.0
    val want = (got._1 - exp) * (got._1 - exp) / exp +
      (got._2 - exp) * (got._2 - exp) / exp
    assert(got._3 == want && got._4 == (want > 3.841458820694124))
  }
}
