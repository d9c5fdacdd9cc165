package graft

import java.sql.Date

import graft.operators.Resample
import org.apache.spark.sql.functions._

/** Gap-fill + forward-fill: spine coverage, fill semantics (leading gaps
  * stay null; observed-null is not a gap), and the per-key window shape. */
class ResampleSpec extends SparkSpec {

  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("fills each key's span and carries the last observation forward") {
    val obs = Seq(
      ("a", d("2024-01-01"), Some(1.0)),
      ("a", d("2024-01-04"), Some(4.0)),
      ("b", d("2024-01-02"), Some(2.0)),
      ("b", d("2024-01-03"), None: Option[Double]) // observed null, not a gap
    ).toDF("k", "dt", "v")
    val got = Resample.gapFillDaily(obs, Seq("k"), "dt", Seq("v"))
      .orderBy("k", "dt")
      .select("k", "dt", "v", "v_filled", "is_gap")
      .as[(String, Date, Option[Double], Option[Double], Boolean)]
      .collect().toSeq
    assert(got == Seq(
      ("a", d("2024-01-01"), Some(1.0), Some(1.0), false),
      ("a", d("2024-01-02"), None, Some(1.0), true),
      ("a", d("2024-01-03"), None, Some(1.0), true),
      ("a", d("2024-01-04"), Some(4.0), Some(4.0), false),
      ("b", d("2024-01-02"), Some(2.0), Some(2.0), false),
      // null OBSERVATION: is_gap=false, but the fill carries 2.0 forward
      ("b", d("2024-01-03"), None, Some(2.0), false)))
  }

  test("single-day keys produce exactly one row; reserved columns guarded") {
    val one = Seq(("x", d("2024-02-01"), 9.0)).toDF("k", "dt", "v")
    assert(Resample.gapFillDaily(one, Seq("k"), "dt", Seq("v")).count() == 1)
    val bad = Seq(("x", d("2024-02-01"), true)).toDF("k", "dt", "__rs_present")
    intercept[IllegalArgumentException] {
      Resample.gapFillDaily(bad, Seq("k"), "dt", Seq("__rs_present"))
    }
  }

  test("plan: spine is an in-row explode, no cartesian/broadcast-nested-loop") {
    val p = SparkEntry.queries("q99_gap_fill")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("Generate explode"), "spine must be a sequence explode:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "no product join in the spine:\n" + p.take(2000))
  }
}
