package graft

import graft.operators.Itemsets
import org.apache.spark.sql.functions._

/** A-priori pair mining: support semantics (presence not multiplicity),
  * downward-closure pruning, the wide-basket cap, and the reused-exchange
  * self-join plan. */
class ItemsetsSpec extends SparkSpec {

  import spark.implicits._

  private val baskets = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "b"), (3L, "b"), // duplicate b: presence, not weight
    (4L, "a"), (4L, "x"),            // x is infrequent at support 2? x appears once
    (5L, "c"), (5L, "a")
  ).toDF("b", "i")

  test("pair supports count baskets, not item multiplicity") {
    val got = Itemsets.frequentPairs(baskets, "b", "i", 2L)
      .orderBy("item_a", "item_b")
      .as[(String, String, Long)].collect().toSeq
    // (a,b): baskets 1,2,3 -> 3; (a,c): baskets 1,5 -> 2; (b,c): basket 1 only -> below
    assert(got == Seq(("a", "b", 3L), ("a", "c", 2L)))
  }

  test("downward closure: infrequent items never form pairs") {
    // "x" has support 1 < 2 — (a,x) must not appear even as a candidate
    val got = Itemsets.frequentPairs(baskets, "b", "i", 2L)
      .where(col("item_a") === "x" || col("item_b") === "x")
    assert(got.count() == 0)
  }

  test("maxBasketItems drops baskets still pathological AFTER the frequent filter") {
    // every item is frequent (support 2 via its singleton basket), so the
    // frequent filter keeps basket 99 at 6 items — over the cap of 5
    val wide = (1 to 6).map(i => (99L, s"i$i")) ++
      (1 to 6).map(i => (10L + i, s"i$i")) ++
      Seq((1L, "i1"), (1L, "i2"), (2L, "i1"), (2L, "i2"))
    val got = Itemsets.frequentPairs(wide.toDF("b", "i"), "b", "i", 2L,
        maxBasketItems = 5)
      .as[(String, String, Long)].collect().toSeq
    // basket 99 dropped whole; (i1,i2) supported by baskets 1 and 2 only
    assert(got == Seq(("i1", "i2", 2L)))
    // without the cap, basket 99's copy of (i1,i2) raises its support to 3
    val uncapped = Itemsets.frequentPairs(wide.toDF("b", "i"), "b", "i", 2L)
      .as[(String, String, Long)].collect().toSeq
    assert(uncapped == Seq(("i1", "i2", 3L)))
  }

  test("plan: frequent filter broadcasts; the pair self-join reuses one exchange") {
    // sf0.01: at sf0.001 the support threshold empties the result and AQE
    // collapses the whole tree to EmptyRelation (nothing left to pin)
    val df = SparkEntry.queries("q101_frequent_pairs")(spark, "/root/testdata/sf0.01")
    df.collect() // runs THIS df's QueryExecution, finalizing the AQE plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange")
      || p.contains("BroadcastQueryStage"),
      "frequent-item semi join must broadcast:\n" + p.take(3000))
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      "self-join sides must share the basket exchange:\n" + p.take(3000))
  }

  test("itemCosine: exact squared-cosine ppm from pair counts and degrees") {
    val bi = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"),
      (4L, "b"), (5L, "a"), (5L, "b"), (5L, "c")).toDF("b", "i")
    val got = Itemsets.itemCosine(bi, "b", "i", minSupport = 1L)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // d_a = 4, d_b = 4, d_c = 1; n_ab = 3 -> 9e6/16 = 562500
    assert(got(("a", "b")) == (("a", "b", 3L, 4L, 4L, 562500L)))
    // n_ac = 1 -> 1e6/(4*1) = 250000; identical items would hit 1e6
    assert(got(("a", "c")) == (("a", "c", 1L, 4L, 1L, 250000L)))
    assert(got(("b", "c")) == (("b", "c", 1L, 4L, 1L, 250000L)))
  }
}
