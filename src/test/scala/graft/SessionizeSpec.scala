package graft

import graft.operators.Sessionize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental sessionization: batch kernel + gap-sweep fragment fusion. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val gap = 100L

  private def sess(df: DataFrame) =
    Sessionize.sessionize(df, "u", "t", gap, col("et") === "p")

  private def canon(df: DataFrame): Seq[(String, Long, Long, Long, Long)] =
    df.select("u", "session_start_us", "session_end_us", "n_events", "n_purchases")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("sessionize splits at gap >= threshold; boundary-exact gap opens") {
    val ev = Seq(
      ("a", 0L, "v"), ("a", 50L, "p"), ("a", 149L, "v"), // one session (99 < 100)
      ("a", 249L, "p"),                                  // exactly 100 -> NEW session
      ("b", 10L, "v")
    ).toDF("u", "t", "et")
    assert(canon(sess(ev)) == Seq(
      ("a", 0L, 149L, 3L, 1L), ("a", 249L, 249L, 1L, 1L), ("b", 10L, 10L, 1L, 0L)))
  }

  test("ordered-batch fold telescopes to the one-shot session table") {
    val rnd = new scala.util.Random(3)
    val ev = (1 to 2000).map { i =>
      val u = s"u${rnd.nextInt(40)}"
      (u, rnd.nextLong(20000L), if (rnd.nextInt(5) == 0) "p" else "v")
    }.toDF("u", "t", "et")
    val oneShot = canon(sess(ev))
    // three time-ordered batches folded through the state
    val cuts = Seq(0L, 7000L, 14000L, Long.MaxValue)
    val folded = cuts.sliding(2).map { case Seq(lo, hi) =>
      sess(ev.where(col("t") >= lo && col("t") < hi))
    }.reduce((st, b) => Sessionize.updateSessionState(st, b, "u", gap))
    assert(canon(folded) == oneShot)
  }

  test("mergeFragments fuses only within-gap neighbors; sums survive") {
    val frags = Seq(
      ("a", 0L, 10L, 3L, 1L), ("a", 60L, 80L, 2L, 0L),   // 50 < gap -> fuse
      ("a", 180L, 190L, 1L, 1L),                          // 100 >= gap -> apart
      ("b", 0L, 5L, 1L, 0L)
    ).toDF("u", "session_start_us", "session_end_us", "n_events", "n_purchases")
    assert(canon(Sessionize.mergeFragments(frags, "u", gap)) == Seq(
      ("a", 0L, 80L, 5L, 1L), ("a", 180L, 190L, 1L, 1L), ("b", 0L, 5L, 1L, 0L)))
    intercept[IllegalArgumentException](
      Sessionize.sessionize(frags.withColumn("__ss_pd", lit(1)), "u",
        "session_start_us", gap, lit(true)))
    intercept[IllegalArgumentException](
      Sessionize.sessionize(frags, "u", "session_start_us", 0L, lit(true)))
  }
}
