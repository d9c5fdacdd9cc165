package graft

import graft.operators.StatePropagation
import java.sql.Date

class StatePropagationSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, String, Boolean, Boolean)]): Map[String, (Boolean, Int)] = {
    val df = rows.map { case (k, d, s, c) => (k, Date.valueOf(d), s, c) }
      .toDF("k", "d", "s", "c")
    StatePropagation.propagateActive(df, Seq("k"), "d", "s", "c")
      .select("d", "active", "episode_day")
      .as[(Date, Boolean, Int)].collect()
      .map { case (d, a, e) => (d.toString, (a, e)) }.toMap
  }

  test("start triggers, continue propagates, neither -> inactive") {
    val got = run(Seq(
      ("u", "2024-01-01", true, true),   // start
      ("u", "2024-01-02", false, true),  // continues
      ("u", "2024-01-03", false, false), // breaks
      ("u", "2024-01-04", false, true))) // continue alone can't start
    assert(got("2024-01-01") == (true, 1))
    assert(got("2024-01-02") == (true, 2))
    assert(got("2024-01-03") == (false, 0))
    assert(got("2024-01-04") == (false, 0))
  }

  test("calendar gap resets prev_active (reference gap semantics)") {
    val got = run(Seq(
      ("u", "2024-01-01", true, true),
      ("u", "2024-01-05", false, true))) // gap: chain broken despite continue
    assert(got("2024-01-01") == (true, 1))
    assert(got("2024-01-05") == (false, 0))
  }

  test("restart after gap via start condition") {
    val got = run(Seq(
      ("u", "2024-01-01", true, true),
      ("u", "2024-01-05", true, true),
      ("u", "2024-01-06", false, true)))
    assert(got("2024-01-05") == (true, 1))
    assert(got("2024-01-06") == (true, 2))
  }

  test("start day without continue still activates and can chain") {
    val got = run(Seq(
      ("u", "2024-01-01", true, false),  // s alone
      ("u", "2024-01-02", false, true))) // chains off it
    assert(got("2024-01-01") == (true, 1))
    assert(got("2024-01-02") == (true, 2))
  }
}
