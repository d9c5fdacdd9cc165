package graft

import graft.operators.ControlChart
import org.apache.spark.sql.functions._

/** Fixed-point EWMA control chart: hand-computed recurrence, spike
  * masking rule, key isolation, and the O(1)-state partition contract. */
class ControlChartSpec extends SparkSpec {
  import spark.implicits._

  test("recurrence matches a hand-rolled fold; first row seeds e=v, d=0") {
    val df = Seq(
      (1L, 1L, 100L), (1L, 2L, 100L), (1L, 3L, 200L), (1L, 4L, 100L),
      (2L, 1L, 50L)
    ).toDF("k", "t", "v")
    val out = ControlChart.ewmaChart(df, Seq("k"), Seq("t"), "v")
      .select("k", "rn", "ewma", "dev", "resid", "is_spike")
      .as[(Long, Long, Long, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    // k=1: e1=100,d1=0; r2=0 -> e2=(100+300)/4=100, d2=0;
    // r3=100 -> e3=(200+300)/4=125, d3=(100+0)/4=25;
    // r4=100-125=-25 -> spike: d=25>0, |r|=25 > 3*25? no. e4=(100+375)/4=118, d4=(25+75)/4=25
    assert(out.toSeq == Seq(
      (1L, 1L, 100L, 0L, None, false),
      (1L, 2L, 100L, 0L, Some(0L), false),
      (1L, 3L, 125L, 25L, Some(100L), false),
      (1L, 4L, 118L, 25L, Some(-25L), false),
      (2L, 1L, 50L, 0L, None, false)))
  }

  test("spike fires on |resid| > k*dev_prev and does not poison ewma order") {
    // stable series then a big jump: dev settles > 0, jump flags
    val rows = (1L to 10L).map(t => (1L, t, 100L + (t % 2) * 4)) :+ ((1L, 11L, 1000L))
    val out = ControlChart.ewmaChart(rows.toDF("k", "t", "v"),
      Seq("k"), Seq("t"), "v")
      .where(col("t") === 11L).select("is_spike").as[Boolean].collect()
    assert(out.toSeq == Seq(true))
  }

  test("keys are isolated under a single shuffled partition layout") {
    val df = (1L to 50L).flatMap(k => (1L to 20L).map(t => (k, t, k * 10 + t)))
      .toDF("k", "t", "v")
    val out = ControlChart.ewmaChart(df, Seq("k"), Seq("t"), "v")
    // every key restarts: rn 1..20 per key, first-row resid null
    assert(out.groupBy("k").agg(max("rn").as("m"), min("rn").as("n"))
      .where(col("m") =!= 20L || col("n") =!= 1L).count() == 0)
    assert(out.where(col("rn") === 1L && col("resid").isNotNull).count() == 0)
    assert(out.count() == 1000)
  }

  test("reserved output columns and non-long values are rejected") {
    intercept[IllegalArgumentException] {
      ControlChart.ewmaChart(Seq((1L, 1L, 1L)).toDF("k", "t", "ewma"),
        Seq("k"), Seq("t"), "ewma")
    }
    intercept[IllegalArgumentException] {
      ControlChart.ewmaChart(Seq((1L, 1L, 1.0)).toDF("k", "t", "v"),
        Seq("k"), Seq("t"), "v")
    }
  }
}
