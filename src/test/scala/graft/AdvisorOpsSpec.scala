package graft

/** Physical-design advisor, capacity forecast, cluster silhouette. */
class AdvisorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q201 advisor: each probe's aligned layout prunes best") {
    val got = SparkEntry.queries("q201_index_advisor")(
      spark, "/root/testdata/sf0.001")
      .select("layout", "probe", "rows_scanned", "rows_matched", "frac_scanned")
      .as[(String, String, Long, Long, Double)].collect()
    assert(got.length == 9)
    got.foreach { case (_, _, scanned, matched, frac) =>
      assert(matched <= scanned, "a zone-map can only over-read, never under")
      // 0.0 is legitimate: a predicate with no matching zones at this SF
      // prunes everything
      assert(frac >= 0.0 && frac <= 1.0)
    }
    val aligned = Map("ship_q1_1997" -> "by_month",
      "orderkey_band" -> "by_orderkey", "price_band" -> "by_price")
    aligned.foreach { case (probe, best) =>
      val rows = got.filter(_._2 == probe)
      val bestFrac = rows.find(_._1 == best).get._5
      rows.foreach { r =>
        assert(bestFrac <= r._5 + 1e-12,
          s"$best should win $probe but ${r._1} scanned less")
      }
    }
  }

  test("q202 forecast: 7 rows on the exact trend line") {
    val got = SparkEntry.queries("q202_token_forecast")(
      spark, "/root/testdata/sf0.001")
      .select("day", "forecast_events", "slope", "intercept")
      .as[(Long, Double, Double, Double)].collect()
    assert(got.length == 7)
    got.foreach { case (d, f, s, i) =>
      assert(f == i + s * d.toDouble, "forecast must be ON the fitted line")
    }
    assert(got.map(_._1).sorted.toSeq == got.map(_._1).toSeq)
  }

  test("watermarkPlanner: drops are monotone in W; known late event counted") {
    import org.apache.spark.sql.functions._
    // arrival order 0..4; event 3 arrives 100 units late (t=5 after
    // runmax 105), event 4 on time
    val df = Seq((0L, 100L), (1L, 105L), (2L, 103L), (3L, 5L), (4L, 110L))
      .toDF("o", "t")
    val got = graft.operators.Sweep.watermarkPlanner(df, "o", "t",
      bucketWidth = 2L, candidates = Seq(1L, 50L, 1000L))
      .orderBy("watermark")
      .select("watermark", "n_events", "n_dropped")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L, 2L), (50L, 5L, 1L), (1000L, 5L, 0L)),
      s"lateness: event 2 is 2 late, event 3 is 100 late: $got")
  }

  test("q204/q205/q206 invariants on real data") {
    val wm = SparkEntry.queries("q204_watermark_planner")(
      spark, "/root/testdata/sf0.001")
      .orderBy("watermark").select("n_dropped").as[Long].collect()
    assert(wm.length == 3)
    wm.sliding(2).foreach {
      case Array(hi, lo) => assert(lo <= hi, "a looser watermark drops less")
      case _ =>
    }
    val did = SparkEntry.queries("q205_did_readout")(spark, "/root/testdata/sf0.001")
      .select("m00", "m01", "m10", "m11", "did")
      .as[(Double, Double, Double, Double, Double)].head()
    assert(did._5 == (did._4 - did._3) - (did._2 - did._1))
    val ss = SparkEntry.queries("q206_seasonal_strength")(
      spark, "/root/testdata/sf0.001")
      .select("mad_raw", "mad_resid", "strength")
      .as[(Double, Double, Option[Double])].collect()
    assert(ss.nonEmpty)
    ss.foreach { case (raw, resid, st) =>
      assert(raw >= 0.0 && resid >= 0.0)
      st.foreach(v => assert(v >= 0.0 && v <= 1.0))
    }
  }

  test("q207 bands: lo <= point <= hi, bands parallel to the trend") {
    val got = SparkEntry.queries("q207_forecast_bands")(
      spark, "/root/testdata/sf0.001")
      .select("day", "forecast_events", "lo", "hi")
      .as[(Long, Double, Double, Double)].collect()
    assert(got.length == 7)
    got.foreach { case (_, f, lo, hi) =>
      assert(lo <= f + 1e-9 && f <= hi + 1e-9,
        "p10 residual <= 0 <= p90 residual around the fit")
    }
    // band width constant across horizon (empirical quantiles, no fan-out)
    val widths = got.map(r => r._4 - r._3)
    assert(widths.forall(w => math.abs(w - widths.head) < 1e-9))
  }

  test("q203 silhouette: pointwise other >= intra forces ordered medians") {
    val got = SparkEntry.queries("q203_cluster_silhouette")(
      spark, "/root/testdata/sf0.001")
      .select("n", "med_intra", "med_other", "med_margin")
      .as[(Long, Double, Double, Double)].collect()
    assert(got.nonEmpty && got.map(_._1).sum == 500L,
      "every vector belongs to exactly one cluster")
    got.foreach { case (_, mi, mo, mm) =>
      assert(mo >= mi, "second-best distance is never below the best")
      assert(mm >= 0.0)
    }
  }
}
