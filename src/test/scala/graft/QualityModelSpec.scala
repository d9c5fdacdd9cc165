package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityModel

/** Model-based quality filtering: hard-sigmoid logistic regression
  * trained by fixed-point full-batch GD (q255). */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  test("hard sigmoid scoring: clamp and integer quarter-slope") {
    // w = (bias=100000, w1=1000): x=0 → p = 500000 + 100000//4 = 525000;
    // x=100 → z = 200000 → 550000; large negative saturates at 0
    val df = Seq((0L, 0L), (1L, 100L), (2L, -10000L)).toDF("id", "x")
    val got = QualityModel
      .scoreHardSigmoid(df, Seq("x"), Seq(100000L, 1000L))
      .orderBy("id").select("p_fp").as[Long].collect()
    assert(got(0) == 525000L)
    assert(got(1) == 550000L)
    assert(got(2) == 0L, "z = 100000 − 1e7 → clamped to 0")
  }

  test("negative z uses magnitude floor division (sign-magnitude parity)") {
    // z = −5: |z| div 4 = 1 → p = 500000 − 1 = 499999. A signed floor
    // division would give −2 → 499998 and silently diverge the oracle.
    val df = Seq((0L, 1L)).toDF("id", "x")
    val got = QualityModel
      .scoreHardSigmoid(df, Seq("x"), Seq(0L, -5L))
      .select("p_fp").as[Long].head()
    assert(got == 499999L)
  }

  test("training learns a separable sign: weight tracks the label") {
    // y = 1 iff x > 0 on centered ±10 features: one feature carries all
    // signal; after a few rounds its weight is positive and large while
    // the noise feature stays near 0
    val rows = (0 until 200).map { i =>
      val x = if (i % 2 == 0) 10L else -10L
      val noise = (i % 7).toLong - 3L
      (if (x > 0) 1L else 0L, x, noise)
    }
    val df = rows.toDF("y", "x1", "x2")
    val w = QualityModel.trainHardSigmoidLr(
      df, "y", Seq("x1", "x2"), iterations = 6, lrDen = 5L)
    assert(w(1) > 10000L, s"signal weight should grow positive: $w")
    assert(math.abs(w(2)) < w(1) / 4, s"noise weight stays small: $w")
    val scored = QualityModel.scoreHardSigmoid(df, Seq("x1", "x2"), w)
    val acc = scored
      .select(when((col("p_fp") >= 500000L) === (col("y") === 1L), 1L)
        .otherwise(0L).as("ok"))
      .agg(sum("ok")).as[Long].head()
    assert(acc == 200L, "separable data must be perfectly classified")
  }

  test("centerFeatures: floor means subtracted, means returned") {
    val df = Seq((1L, 10L, -5L), (2L, 21L, -6L)).toDF("id", "a", "b")
    val (c, means) = QualityModel.centerFeatures(df, Seq("a", "b"))
    // mean a = 31 div 2 = 15; mean b = sign-magnitude: −(11 div 2) = −5
    assert(means == Seq(15L, -5L))
    val got = c.orderBy("id").select("a", "b").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((-5L, 0L), (6L, -1L)))
  }

  test("reliability deciles: bucket algebra and p=scale edge") {
    val df = Seq((1L, 1000000L), (1L, 950000L), (0L, 50000L), (0L, 120000L))
      .toDF("y", "p_fp")
    val got = QualityModel.reliabilityDeciles(df, "y")
      .as[(Long, Long, Long, Long, Long)].collect()
    // p = 1e6 lands in bucket 9 (least(10,9)), not a phantom bucket 10
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 9L))
    assert(got(2) == ((9L, 2L, 2L, 10000L, 9750L)))
    assert(got(0) == ((0L, 1L, 0L, 0L, 500L)))
  }

  test("q255 builder: deciles populated, calibrated, and label-tracking") {
    val got = SparkEntry.queries("q255_quality_lr")(
      spark, "/root/testdata/sf0.001").collect()
    assert(got.length >= 4, s"expected a spread of deciles, got ${got.length}")
    val (first, last) = (got.head, got.last)
    // the fit must order the corpus: top decile's positive rate far above
    // the bottom's
    assert(last.getLong(3) > first.getLong(3) + 3000,
      s"top bucket pos_bp ${last.getLong(3)} vs bottom ${first.getLong(3)}")
    // calibration: per-bucket mean prediction sits inside its bin
    got.foreach { r =>
      val (b, pred) = (r.getLong(0), r.getLong(4))
      assert(pred >= b * 1000 - 500 && pred <= (b + 1) * 1000 + 500,
        s"bucket $b mean prediction $pred far outside its bin")
    }
  }
}
