package graft

import graft.operators.ViewMaintenance
import org.apache.spark.sql.functions._

/** View-maintenance deltas, cube rollup, estimation and ladder
  * invariants. */
class MaintenanceOpsSpec extends SparkSpec {
  import spark.implicits._

  test("countDelta: only batch-touched groups emit; born groups start at 0") {
    val store = Seq(("a", 2L), ("c", 9L)).toDF("k", "old_n")
    val batch = Seq("a", "a", "b").toDF("k")
    val got = ViewMaintenance.countDelta(store, batch, Seq("k"))
      .as[(String, Long, Long, Long)].collect().toSet
    // c is untouched -> absent; b is new -> old 0
    assert(got == Set(("a", 2L, 4L, 2L), ("b", 0L, 1L, 1L)))
  }

  test("q193 cube: grand total consistent, full lattice present") {
    val got = SparkEntry.queries("q193_cube_rollup")(spark, "/root/testdata/sf0.001")
      .select("segment", "priority", "gid", "n_orders")
      .as[(Option[String], Option[String], Long, Long)].collect()
    val detail = got.filter(_._3 == 0L)
    val grand = got.filter(_._3 == 3L)
    assert(grand.length == 1)
    assert(detail.map(_._4).sum == grand.head._4,
      "detail cells must sum to the grand total")
    val segTotals = got.filter(_._3 == 1L) // priority rolled up
    assert(segTotals.map(_._4).sum == grand.head._4)
  }

  test("q194 ladder: coarsening never increases suppression") {
    val got = SparkEntry.queries("q194_generalization_ladder")(
      spark, "/root/testdata/sf0.001")
      .select("rung", "suppression_rate").as[(String, Double)].collect().toMap
    assert(got("w100") >= got("w1000") && got("w1000") >= got("nation_only"),
      s"ladder must be monotone: $got")
  }

  test("q192 estimate: bounded below by the head moment, err well-defined") {
    val got = SparkEntry.queries("q192_join_estimate")(
      spark, "/root/testdata/sf0.001")
      .select("true_f2", "est_f2", "rel_err").as[(Double, Double, Double)].head()
    assert(got._1 > 0 && got._2 > 0)
    assert(got._3 == (got._2 - got._1) / got._1)
  }
}
