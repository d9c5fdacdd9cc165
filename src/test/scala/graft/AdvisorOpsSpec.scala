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
