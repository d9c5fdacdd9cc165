package graft

import org.apache.spark.sql.functions._
import graft.operators.Preference

/** Preference-data curation: Bradley–Terry fixed-point strengths and the
  * annotator agreement/position-bias audit (q250/q251). */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("bradley-terry: hand-checkable two-item recurrence") {
    // 3 wins for item 1 over item 0, 1 win for item 0: W0=1, W1=3, n01=4.
    val pairs = Seq((1L, 0L), (1L, 0L), (1L, 0L), (0L, 1L))
      .toDF("winner", "loser")
    val got = Preference
      .bradleyTerryFixedPoint(pairs, "winner", "loser", iterations = 5)
      .orderBy("item")
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == Seq(0L, 1L))
    assert(got.map(_._2).toSeq == Seq(1L, 3L), "wins column is the raw count")
    val Seq(s0, s1) = got.map(_._3).toSeq
    // MM fixed point of (W0=1, W1=3) is s1/s0 = 3 under mean-normalization:
    // s = (0.5, 1.5) in real arithmetic. Fixed point at SCALE=1e6 lands
    // within floor-division slack of (500000, 1500000).
    assert(s1 > s0, "3-of-4 winner must rank above")
    assert(math.abs(s0 - 500000L) <= 5 && math.abs(s1 - 1500000L) <= 5,
      s"expected ~(500000, 1500000), got ($s0, $s1)")
    // renormalization contract: mean strength == SCALE (up to floor slack)
    assert(math.abs((s0 + s1) - 2000000L) <= 5)
  }

  test("bradley-terry: recovers the latent ordering it was generated from") {
    // judgments drawn from the exact q250 generative law over 10 items
    // with latent strength item+1: every md5-keyed draw is deterministic,
    // and with 4000 judgments the fitted ordering must put the strongest
    // and weakest items on the right ends (full rank agreement is a
    // sample-size question, the ends are not).
    val k = 10L
    val rows = (0L until 4000L).map { e =>
      def h(tag: String) =
        graft.functions.PortableHash.md5Hash60Local(s"$e$tag")
      val a = h(":a") % k
      val b0 = h(":b") % (k - 1)
      val b = if (b0 >= a) b0 + 1 else b0
      val winA = h(":w") % (a + b + 2) < a + 1
      if (winA) (a, b) else (b, a)
    }
    val got = Preference
      .bradleyTerryFixedPoint(rows.toDF("winner", "loser"), "winner", "loser")
      .orderBy(col("score").desc, col("item"))
      .as[(Long, Long, Long)].collect()
    assert(got.length == 10)
    assert(got.head._1 == k - 1, s"strongest latent item should fit first: $got")
    assert(got.last._1 == 0L, s"weakest latent item should fit last: $got")
    // monotone in the large: top half of fitted ranks averages a higher
    // latent strength than the bottom half
    val (top, bot) = got.map(_._1).splitAt(5)
    assert(top.sum > bot.sum)
  }

  test("bradley-terry: zero-win items floor at 1, never a zero denominator") {
    // item 2 loses everything; its score floors at >= 1 and the other
    // scores stay finite across iterations (no division by a zeroed sum)
    val pairs = Seq((0L, 2L), (1L, 2L), (0L, 1L), (1L, 0L))
      .toDF("winner", "loser")
    val got = Preference
      .bradleyTerryFixedPoint(pairs, "winner", "loser", iterations = 7)
      .orderBy("item").as[(Long, Long, Long)].collect()
    assert(got.map(_._3).forall(_ >= 1L))
    assert(got(2)._2 == 0L && got(2)._3 < got(0)._3 && got(2)._3 < got(1)._3)
  }

  test("annotator audit: majority, tie rule, and position counts") {
    // pair (1,2): annotator 10 says 1 twice, annotator 20 says 2 once →
    // majority 1. pair (3,4): one vote each way → tie → smaller id 3.
    val j = Seq(
      (10L, 1L, 2L, 1L), (10L, 2L, 1L, 1L), (20L, 1L, 2L, 2L),
      (10L, 3L, 4L, 3L), (20L, 4L, 3L, 4L))
      .toDF("annotator", "first", "second", "winner")
    val got = Preference
      .annotatorAudit(j, "annotator", "first", "second", "winner")
      .orderBy("annotator")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // annotator 10: 3 judgments, agrees on (1,2)x2 and the (3,4) tie → 3;
    // first-position wins: rows 1 and 4 (winner==first) → 2
    assert(got(0) == ((10L, 3L, 3L, 10000L, 2L, 6666L)))
    // annotator 20: 2 judgments, agrees on neither (said 2 vs majority 1,
    // said 4 vs tie-majority 3); first-position wins: row 5 (4 shown
    // first, 4 won) → 1
    assert(got(1) == ((20L, 2L, 0L, 0L, 1L, 5000L)))
  }

  test("calibration curve: hand-checkable bucket algebra") {
    // fixed strengths (no fit): item 0 at 0.75, item 1 at 0.25 → every
    // (0,1) judgment predicts lo-win ppm 750000 → bucket 7; feed 3 wins
    // for 0 and 1 for 1 → observed 7500 bp, perfectly calibrated
    val strengths = Seq((0L, 750000L), (1L, 250000L)).toDF("item", "score")
    val j = Seq((0L, 1L), (0L, 1L), (0L, 1L), (1L, 0L)).toDF("winner", "loser")
    val got = Preference.calibrationCurve(j, "winner", "loser", strengths)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((7L, 4L, 3L, 7500L, 7500L, 0L)))
  }

  test("calibration curve: the BT-law corpus tracks the diagonal") {
    // fit + score the same md5-law corpus the recovery test uses: the
    // generating law IS the fitted model family, so the reliability
    // curve must hug the diagonal — judgment-weighted mean |gap| small,
    // and every bucket's predicted mean inside its own bin edges
    val k = 10L
    val rows = (0L until 4000L).map { e =>
      def h(tag: String) =
        graft.functions.PortableHash.md5Hash60Local(s"$e$tag")
      val a = h(":a") % k
      val b0 = h(":b") % (k - 1)
      val b = if (b0 >= a) b0 + 1 else b0
      if (h(":w") % (a + b + 2) < a + 1) (a, b) else (b, a)
    }
    val j = rows.toDF("winner", "loser")
    val fit = Preference.bradleyTerryFixedPoint(j, "winner", "loser")
    val got = Preference
      .calibrationCurve(j, "winner", "loser", fit.select("item", "score"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty && got.forall(r => r._1 >= 0 && r._1 <= 9))
    got.foreach { case (bucket, _, _, obs, pred, gap) =>
      assert(pred >= bucket * 1000 && pred < (bucket + 1) * 1000,
        s"bucket $bucket mean prediction $pred outside its bin")
      assert(gap == math.abs(obs - pred))
    }
    val n = got.map(_._2).sum
    val wgap = got.map(r => r._6 * r._2).sum / n
    assert(wgap <= 700, s"judgment-weighted mean |gap| $wgap bp off-diagonal")
  }

  test("q250/q251 builders run at sf0.001 with exact integer outputs") {
    val bt = SparkEntry.queries("q250_bradley_terry")(
      spark, "/root/testdata/sf0.001").collect()
    assert(bt.nonEmpty && bt.length <= 50)
    val ranks = bt.map(_.getLong(3))
    assert(ranks.toSeq == (1L to bt.length).toSeq, "dense contiguous ranks")
    val audit = SparkEntry.queries("q251_annotator_audit")(
      spark, "/root/testdata/sf0.001").collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      val (n, agree, abp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(agree <= n && abp == agree * 10000L / n)
    }
  }
}
