package graft

import graft.operators.BloomPrune
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prune semi join: exactness at any fpp (the filter only prunes,
  * the exact join decides), key-type normalization, and the plan shape
  * (probe INSIDE the fact-side filter, before the join exchange). */
class BloomPruneSpec extends SparkSpec {

  import spark.implicits._

  private def plainSemi(fact: DataFrame, fk: String, dim: DataFrame, dk: String): Seq[Long] =
    fact.join(dim.select(col(dk).as("__k")).where(col("__k").isNotNull),
        col(fk) === col("__k"), "left_semi")
      .select(col(fk)).as[Long].collect().toSeq.sorted

  test("long keys: identical to plain semi join, even at fpp=0.5") {
    val fact = (1L to 2000L).toDF("k")
    val dim = (1L to 2000L by 7).toDF("d")
    for (fpp <- Seq(0.01, 0.5)) {
      val got = BloomPrune.semiJoin(fact, col("k"), dim, col("d"),
          expectedItems = 300L, fpp = fpp)
        .select("k").as[Long].collect().toSeq.sorted
      assert(got == plainSemi(fact, "k", dim, "d"), s"fpp=$fpp")
    }
  }

  test("string keys hash through md5Hash60 on both sides") {
    val fact = Seq("a", "b", "c", "dd", "ee", "zz").toDF("k")
    val dim = Seq("b", "ee", "nope").toDF("d")
    val got = BloomPrune.semiJoin(fact, col("k"), dim, col("d"), 100L)
      .select("k").as[String].collect().toSeq.sorted
    assert(got == Seq("b", "ee"))
  }

  test("null keys never match; empty dim yields empty result") {
    val fact = Seq(Some(1L), None, Some(3L)).toDF("k")
    val dim = Seq(Some(1L), None).toDF("d")
    val got = BloomPrune.semiJoin(fact, col("k"), dim, col("d"), 10L)
      .select("k").as[Long].collect().toSeq
    assert(got == Seq(1L))
    val none = BloomPrune.semiJoin(fact, col("k"),
      spark.emptyDataset[Long].toDF("d"), col("d"), 10L)
    assert(none.count() == 0L)
  }

  test("reserved internal column is guarded") {
    val bad = Seq(1L).toDF("__bp_k")
    intercept[IllegalArgumentException] {
      BloomPrune.semiJoin(bad, col("__bp_k"), Seq(1L).toDF("d"), col("d"), 10L)
    }
  }

  test("plan: might_contain probes the fact side BEFORE the join") {
    val p = SparkEntry.queries("q97_bloom_prune")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), "bloom probe must be in the plan:\n" + p.take(2000))
    // the probe must sit in a Filter in the scan stage, not after the join:
    // in the tree rendering the join node appears ABOVE its children, so
    // the first might_contain occurrence must be below the semi join node
    val joinIdx = p.indexOf("LeftSemi")
    val probeIdx = p.indexOf("might_contain")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "probe must be inside the join's fact-side subtree (scan stage):\n" + p.take(2000))
  }
}
