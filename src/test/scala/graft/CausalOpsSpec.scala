package graft

import org.apache.spark.sql.functions._

/** Invariants for the stratified treatment-effect readout (q225) on real
  * testdata; bit-parity with DuckDB is the driver oracle's job, these pin
  * the estimator's semantics. */
class CausalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q225: every retained band has both arms and an exact mean identity") {
    val rows = SparkEntry.queries("q225_stratified_ate")(
      spark, "/root/testdata/sf0.001")
      .select("band", "n_treated", "n_control", "sum_treated",
        "sum_control", "att_cents")
      .as[(Long, Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(rows.nonEmpty, "sf0.001 must produce at least one overlapping band")
    rows.foreach { case (_, nt, nc, st, sc, att) =>
      assert(nt > 0 && nc > 0, "CEM drops bands missing an arm")
      // the only doubles are two divisions + one subtraction over exact
      // integer sums - replay them and demand bit equality
      assert(att == st.toDouble / nt.toDouble - sc.toDouble / nc.toDouble)
    }
    val bands = rows.map(_._1)
    assert(bands == bands.sorted, "output ordered by band")
  }

  test("q225: retained units bounded by the distinct-user grain") {
    // band = pre >> 14 is a function of pre, so a user lands in exactly
    // one band; arms partition a band by user_id parity
    val total = SparkEntry.queries("q225_stratified_ate")(
      spark, "/root/testdata/sf0.001")
      .agg(sum(col("n_treated") + col("n_control")))
      .collect()(0).getLong(0)
    val users = Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id").distinct().count()
    assert(total > 0 && total <= users)
  }

  test("q226: KM risk-table identities on real events") {
    val rows = SparkEntry.queries("q226_km_risk_table")(
      spark, "/root/testdata/sf0.001")
      .select("duration_days", "n_risk", "n_event", "n_censor", "hazard_ppm")
      .as[(Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(rows.nonEmpty)
    val users = Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id").distinct().count()
    // every user leaves the risk set exactly once (event or censor)
    assert(rows.map(r => r._3 + r._4).sum == users)
    // n_risk at the earliest duration is the whole cohort, and the
    // reverse-cumulative structure makes it strictly decreasing
    assert(rows.head._2 == users)
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 == a._2 - a._3 - a._4, "risk set shrinks by exits")
    case _ => ()
    }
    rows.foreach { case (_, nr, ne, _, h) =>
      assert(h == ne * 1000000L / nr && h <= 1000000L)
    }
  }

  test("q227: split-conformal coverage lands near the 90% contract") {
    val Seq((nTrain, nCal, k, qhat, nTest, nCov, ppm)) =
      SparkEntry.queries("q227_conformal_coverage")(
        spark, "/root/testdata/sf0.001")
        .select("n_train", "n_cal", "k", "qhat", "n_test", "n_covered",
          "coverage_ppm")
        .as[(Long, Long, Long, Double, Long, Long, Long)]
        .collect().toSeq
    assert(nTrain > 0 && nCal > 0 && nTest > 0)
    assert(k == (9L * (nCal + 1L) + 9L) / 10L, "exact-integer ceil(0.9(n+1))")
    assert(k >= 1 && k <= nCal)
    assert(qhat >= 0.0)
    assert(nCov <= nTest && ppm == nCov * 1000000L / nTest)
    // marginal validity: >=90% expected; tolerate small-split noise down
    // to 80% on the 0.001 fixture
    assert(ppm >= 800000L && ppm <= 1000000L, s"coverage $ppm ppm")
  }

  test("q228: the window closed form equals the sequential CUSUM recursion") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q228_cusum_change")(spark, dir)
      .select("event_type", "b", "a", "h", "max_cusum", "alarm_day",
        "n_alarm_days")
      .as[(String, Long, Long, Long, Long, Option[Long], Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    // sequential replay: S_t = max(0, S_{t-1} + x_t - b - a) per type
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        graft.operators.Funnel.epochDayFromNanos(col("ts")).as("day"))
    val Seq((lo, hi)) =
      ev.agg(min("day"), max("day")).as[(Long, Long)].collect().toSeq
    val pivot = (lo + hi + 1L) / 2L
    val daily = ev.groupBy("event_type", "day").count()
      .as[(String, Long, Long)].collect()
    for ((t, (_, b, a, h, mx, alarm, nAlarm)) <- got) {
      val series = daily.filter(r => r._1 == t && r._2 >= pivot)
        .sortBy(_._2).map(r => (r._2, r._3))
      var s = 0L; var best = 0L; var firstAlarm = Option.empty[Long]; var n = 0L
      for ((day, x) <- series) {
        s = math.max(0L, s + x - b - a)
        best = math.max(best, s)
        if (s > h) { n += 1; if (firstAlarm.isEmpty) firstAlarm = Some(day) }
      }
      assert(mx == best && alarm == firstAlarm && nAlarm == n,
        s"type $t: closed form diverged from the recursion")
    }
  }
}
