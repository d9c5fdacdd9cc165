package graft

import graft.operators.Expectations
import graft.operators.Expectations._
import org.apache.spark.sql.functions._

/** Declarative data-contract report: per-check counters and semantics. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("row-local + grouped + fk checks report exact counters in one frame") {
    val df = Seq(
      (Some(1L), Some(10.0), "A", "1-URGENT"),
      (Some(2L), Some(-5.0), "B", "9-JUNK"),
      (Some(2L), Some(20.0), "A", "2-HIGH"),
      (None, Some(30.0), "C", "3-MEDIUM"),
      (Some(4L), None, "A", "1-URGENT")
    ).toDF("id", "v", "status", "pri")
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val got = Expectations.report(df, Seq(
      NotNull("id"),
      Unique(Seq("id")),
      InRange("v", lit(0.0), lit(25.0)),
      InSet("status", Seq("A", "B")),
      Matches("pri", "^[1-3]-"),
      ForeignKey("id", dim, "k")))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      // fk: 4 non-null ids, id 4 unmatched
      ("fk:id", 4L, 1L, false),
      // in_range: 4 non-null values, -5 and 30 outside [0, 25]
      ("in_range:v", 4L, 2L, false),
      // in_set: all 5 non-null, C violates
      ("in_set:status", 5L, 1L, false),
      // not_null: 5 rows, one null id
      ("not_null:id", 5L, 1L, false),
      // regex: 9-JUNK misses the anchor
      ("regex:pri", 5L, 1L, false),
      // unique: 4 non-null-key rows, the duplicated id 2 contributes BOTH rows
      ("unique:id", 4L, 2L, false)))
  }

  test("clean data passes; empty input yields zero counters, pass = true") {
    val clean = Seq((1L, "A"), (2L, "B")).toDF("id", "status")
    val ok = Expectations.report(clean, Seq(NotNull("id"), Unique(Seq("id"))))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(ok == Seq(("not_null:id", 2L, 0L, true), ("unique:id", 2L, 0L, true)))
    val empty = Expectations.report(clean.where(lit(false)),
      Seq(NotNull("id"), Unique(Seq("id")),
        ForeignKey("id", Seq(1L).toDF("k"), "k")))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(empty == Seq(("fk:id", 0L, 0L, true), ("not_null:id", 0L, 0L, true),
      ("unique:id", 0L, 0L, true)))
  }

  test("contracts: duplicate names, empty checks, reserved columns refused") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException](Expectations.report(df, Nil))
    intercept[IllegalArgumentException](
      Expectations.report(df, Seq(NotNull("a"), NotNull("a"))))
    intercept[IllegalArgumentException](
      Expectations.report(df.withColumn("__ex_k", lit(1)), Seq(NotNull("a"))))
    intercept[IllegalArgumentException](Unique(Nil))
    intercept[IllegalArgumentException](InSet("a", Nil))
  }

  test("multi-column unique keys count composite duplicates") {
    val df = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x")).toDF("a", "b")
    val got = Expectations.report(df, Seq(Unique(Seq("a", "b"))))
      .as[(String, Long, Long, Boolean)].head()
    assert(got == (("unique:a,b", 4L, 2L, false)))
  }
}
