package graft

import graft.operators.TableDiff
import org.apache.spark.sql.functions._

/** Snapshot diff: classification of all four change kinds, null-safe value
  * comparison, changed-column lists, and the single-exchange-pair plan. */
class TableDiffSpec extends SparkSpec {

  import spark.implicits._

  private val old = Seq(
    (1L, Some("a"), Some(1.0)),  // unchanged
    (2L, Some("b"), Some(2.0)),  // value change
    (3L, None: Option[String], Some(3.0)), // null -> value = changed
    (4L, Some("d"), Some(4.0)),  // removed
    (6L, Some("f"), None: Option[Double])  // value -> null = changed
  ).toDF("k", "s", "v")

  private val nw = Seq(
    (1L, Some("a"), Some(1.0)),
    (2L, Some("b"), Some(2.5)),
    (3L, Some("c"), Some(3.0)),
    (5L, Some("e"), Some(5.0)),  // added
    (6L, Some("f"), Some(6.0))
  ).toDF("k", "s", "v")

  test("classifies added/removed/changed with changed-column lists") {
    val got = TableDiff.diff(old, nw, Seq("k"))
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(got == Seq(
      (2L, "changed", "v"),
      (3L, "changed", "s"),
      (4L, "removed", ""),
      (5L, "added", ""),
      (6L, "changed", "v")))
  }

  test("includeUnchanged keeps the full key universe") {
    val got = TableDiff.diff(old, nw, Seq("k"), includeUnchanged = true)
    assert(got.count() == 6)
    assert(got.where(col("change") === "unchanged")
      .select("k").as[Long].collect().toSeq == Seq(1L))
  }

  test("multi-column changes list every differing column, sorted by schema order") {
    val o2 = Seq((1L, "x", 1.0)).toDF("k", "s", "v")
    val n2 = Seq((1L, "y", 2.0)).toDF("k", "s", "v")
    val got = TableDiff.diff(o2, n2, Seq("k")).select("changed_cols").as[String].head()
    assert(got == "s,v")
  }

  test("schema mismatch and reserved columns fail fast") {
    intercept[IllegalArgumentException] {
      TableDiff.diff(old, nw.withColumnRenamed("v", "w"), Seq("k"))
    }
    val bad = Seq((1L, "a")).toDF("k", "__td_o_x")
    intercept[IllegalArgumentException] { TableDiff.diff(bad, bad, Seq("k")) }
  }

  test("plan: one full-outer join, no extra exchanges") {
    val p = TableDiff.diff(old, nw, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(p.contains("FullOuter"), p.take(1500))
    // each side shuffles once on the key; nothing downstream re-exchanges
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 key exchanges, got $exchanges:\n" + p.take(2000))
  }
}
