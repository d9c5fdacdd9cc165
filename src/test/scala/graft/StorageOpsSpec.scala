package graft

import graft.operators.{Layout, PortableBloom, Reconcile}
import org.apache.spark.sql.functions._

/** Storage/reconciliation wave: RLE audit, portable bloom, partition
  * checksums. */
class StorageOpsSpec extends SparkSpec {
  import spark.implicits._

  test("rleRunsReport: value-clustered layout collapses to one run per zone") {
    // 2 zones x alternating values under natural order = a run per row;
    // clustering by the value = exactly one run per distinct value
    val df = (0L until 20L).map(i => (i, i / 10, if (i % 2 == 0) "a" else "b"))
      .toDF("k", "z", "v")
    val natural = Layout.rleRunsReport(df, col("z"), Seq(col("k")), col("v"))
      .select("zones", "rows", "runs").as[(Long, Long, Long)].head()
    assert(natural == ((2L, 20L, 20L)), s"alternating values: every row a run, got $natural")
    val byValue = Layout.rleRunsReport(df, col("v"), Seq(col("k")), col("v"))
      .select("zones", "rows", "runs").as[(Long, Long, Long)].head()
    assert(byValue == ((2L, 20L, 2L)))
  }

  test("PortableBloom: no false negatives; absent probes mostly rejected") {
    val dim = (0L until 50L).toDF("key")
    val present = PortableBloom.fprReport(
      dim, col("key"), dim, col("key"), m = 4096, k = 3)
      .select("n_false_positive", "n_probe").as[(Long, Long)].head()
    // probing with the BUILD keys: every one must pass (bloom's contract)
    assert(present._1 == present._2, "false negatives are impossible")
    val absent = (1000L until 2000L).toDF("key")
    val report = PortableBloom.fprReport(
      dim, col("key"), absent, col("key"), m = 4096, k = 3)
      .select("n_build", "n_bits_set", "n_probe", "n_false_positive", "fpr")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(report._1 == 50L && report._3 == 1000L)
    assert(report._2 <= 150L, "at most n*k bits set")
    // 150/4096 bits set -> fpr ~ (0.036)^3 ~ 5e-5; 1000 probes should
    // see at most a handful
    assert(report._4 <= 5L, s"fpr implausibly high: $report")
  }

  test("Reconcile: equal snapshots match; a dropped row flips exactly its partition") {
    val a = Seq((1L, 10L, "x"), (2L, 10L, "y"), (3L, 11L, "z"))
      .toDF("id", "part", "payload")
    val same = Reconcile.reconcile(a, a, col("part"),
      concat_ws(":", col("id"), col("payload")))
      .select("part", "match_ok").as[(Long, Boolean)].collect().toMap
    assert(same == Map(10L -> true, 11L -> true))
    val b = a.where(col("id") =!= 2L)
    val diff = Reconcile.reconcile(a, b, col("part"),
      concat_ws(":", col("id"), col("payload")))
      .select("part", "n_a", "n_b", "match_ok")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(diff(10L) == ((2L, 1L, false)) && diff(11L) == ((1L, 1L, true)))
  }

  test("Reconcile: same count but different content still mismatches") {
    val a = Seq((1L, 10L, "x")).toDF("id", "part", "payload")
    val b = Seq((1L, 10L, "CHANGED")).toDF("id", "part", "payload")
    val got = Reconcile.reconcile(a, b, col("part"),
      concat_ws(":", col("id"), col("payload")))
      .select("n_a", "n_b", "match_ok").as[(Long, Long, Boolean)].head()
    assert(got == ((1L, 1L, false)), "the checksum, not the count, catches it")
  }
}
