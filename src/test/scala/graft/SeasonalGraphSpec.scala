package graft

import graft.operators.{Seasonal, Triangles}
import org.apache.spark.sql.functions._

/** Seasonal anomaly screen, common-neighbor link prediction, as-was/as-is
  * audit. */
class SeasonalGraphSpec extends SparkSpec {
  import spark.implicits._

  test("weeklyRobustAnomalies: weekend rhythm is baseline, a spike is not") {
    // 4 weeks of a series that always dips to 10 on dow 5 and 6 and runs
    // 100 otherwise, plus ONE spiked day (dow 2 of week 3 at 500). A plain
    // MAD gate over raw values would flag all 8 weekend days; the
    // deseasonalized screen must flag exactly the spike.
    val rows = for {
      week <- 0 until 4
      dow <- 0 until 7
    } yield {
      val day = (week * 7 + dow).toLong
      val v = if (day == 2L + 2 * 7) 500.0
      else if (dow >= 5) 10.0 else 100.0
      ("s1", day, v)
    }
    val got = Seasonal.weeklyRobustAnomalies(
      rows.toDF("series", "day", "v"), "series", "day", "v")
      .select("day", "is_anomaly").as[(Long, Boolean)].collect().toMap
    assert(got(16L), "the spiked day must be flagged")
    assert(got.count(_._2) == 1, s"only the spike should flag: $got")
  }

  test("commonNeighborPairs counts shared neighbors with full-degree jaccard") {
    // 4-cycle 1-2-4-3-1: the two diagonals (2,3) and (1,4) each share both
    // of the other nodes; neither diagonal is itself an edge
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("a", "b")
    val got = Triangles.commonNeighborPairs(edges, "a", "b",
      maxApexDegree = 128L, minCommon = 2L)
      .as[(Long, Long, Long, Long, Long, Double, Boolean)].collect()
      .toSeq.sortBy(r => (r._1, r._2))
    assert(got == Seq(
      (1L, 4L, 2L, 2L, 2L, 1.0, false),
      (2L, 3L, 2L, 2L, 2L, 1.0, false)))
  }

  test("commonNeighborPairs: super-node cap removes hub-apex wedges") {
    // star: hub 0 adjacent to 1..5 -> every leaf pair shares only the hub;
    // capping the hub's degree (5 > 2) must remove all pairs
    val edges = (1L to 5L).map(i => (0L, i)).toDF("a", "b")
    val capped = Triangles.commonNeighborPairs(edges, "a", "b",
      maxApexDegree = 2L, minCommon = 1L).count()
    val uncapped = Triangles.commonNeighborPairs(edges, "a", "b",
      maxApexDegree = 128L, minCommon = 1L).count()
    assert(capped == 0L && uncapped == 10L)
  }

  test("q182 as-was/as-is: fact mass is conserved and 'changed' is honest") {
    val got = SparkEntry.queries("q182_aswas_asis")(spark, "/root/testdata/sf0.001")
      .select("status_aswas", "status_asis", "n_facts", "changed")
      .as[(String, String, Long, Boolean)].collect()
    assert(got.nonEmpty)
    val purchases = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "purchase").count()
    assert(got.map(_._3).sum == purchases,
      "every purchase appears in exactly one (as-was, as-is) cell")
    got.foreach { case (aw, ai, _, ch) => assert(ch == (aw != ai)) }
  }
}
