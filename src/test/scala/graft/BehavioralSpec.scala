package graft

import graft.operators.{Funnel, HeavyHitters, MisraGries, TextSearch}
import org.apache.spark.sql.functions._

/** Funnel / retention / heavy-hitter / vocab-coverage semantics on
  * hand-built fixtures, plus the Misra-Gries guarantees on adversarial
  * streams. */
class BehavioralSpec extends SparkSpec {
  import spark.implicits._

  private def funnelOf(rows: Seq[(Long, Long, String)]) =
    Funnel.funnelSteps(
      rows.toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .orderBy("user_id")
      .select("user_id", "t1", "t2", "t3", "steps_completed")
      .collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4)))

  test("funnel: greedy-earliest, strictly-after, every user present") {
    val out = funnelOf(Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), // full funnel
      (2L, 1L, "b"), (2L, 2L, "a"), (2L, 3L, "c"), // b precedes a: step2 unmet
      (3L, 5L, "a"), // step 1 only
      (4L, 1L, "d"), // no funnel events at all — still a row
      (5L, 1L, "a"), (5L, 1L, "b"), // tie is NOT strictly after
      (6L, 1L, "a"), (6L, 5L, "a"), (6L, 3L, "b"), (6L, 4L, "c")) // greedy t1=1
    )
    assert(out === Seq(
      (1L, Some(1L), Some(2L), Some(3L), 3L),
      (2L, Some(2L), None, None, 1L),
      (3L, Some(5L), None, None, 1L),
      (4L, None, None, None, 0L),
      (5L, Some(1L), None, None, 1L),
      (6L, Some(1L), Some(3L), Some(4L), 3L)))
  }

  test("funnel: later-step events before earlier steps never count") {
    // c exists only BEFORE b resolves → t3 must stay null
    val out = funnelOf(Seq((7L, 1L, "a"), (7L, 2L, "c"), (7L, 3L, "b")))
    assert(out === Seq((7L, Some(1L), Some(3L), None, 2L)))
  }

  test("retention cohorts: integer week grid and two-level distinct") {
    val ev = Seq(
      (1L, 0L), (1L, 3L), (1L, 8L),   // cohort week 0; offsets 0,0,1
      (2L, 6L), (2L, 13L),            // first day 6 → cohort 0; offset 0,1
      (3L, 7L), (3L, 7L), (3L, 21L))  // cohort 1; offsets 0,0,2
      .toDF("user_id", "d")
    val out = Funnel.retentionCohorts(ev, "user_id", col("d"))
      .orderBy("cohort_week", "week_offset")
      .as[(Long, Long, Long, Long)].collect()
    assert(out === Seq(
      (0L, 0L, 2L, 3L), // u1 (days 0,3) + u2 (day 6→offset 0)
      (0L, 1L, 2L, 2L), // u1 day 8, u2 day 13
      (1L, 0L, 1L, 2L), // u3 days 7,7
      (1L, 2L, 1L, 1L))) // u3 day 21
  }

  test("misra-gries: decrement path and bounded buffer") {
    val mg = MisraGries(2)
    var b = mg.zero
    b = mg.reduce(b, "a"); b = mg.reduce(b, "b")
    assert(b === Map("a" -> 1L, "b" -> 1L))
    b = mg.reduce(b, "c") // full + unseen → shared decrement, all drop to 0
    assert(b === Map.empty[String, Long])
    b = mg.reduce(mg.reduce(mg.reduce(b, "d"), "d"), "e")
    assert(b === Map("d" -> 2L, "e" -> 1L))
    assert(mg.reduce(b, "f") === Map("d" -> 1L)) // d survives the decrement
  }

  test("misra-gries: merge subtracts the (k+1)-th largest and stays ≤ k") {
    val mg = MisraGries(2)
    val m = mg.merge(Map("a" -> 5L, "b" -> 3L), Map("b" -> 2L, "c" -> 2L))
    // summed: a=5 b=5 c=2; cut = 3rd largest = 2 → a=3 b=3
    assert(m === Map("a" -> 3L, "b" -> 3L))
    assert(mg.merge(Map("a" -> 1L), Map.empty) === Map("a" -> 1L))
  }

  test("misra-gries sketch never loses a true heavy hitter (adversarial skew)") {
    val rnd = new scala.util.Random(7)
    // 40% one hot key, the rest spread over 200 cold keys; k=9 → any item
    // above n/10 must survive arbitrary partitioning
    val items = Seq.fill(5000)(
      if (rnd.nextInt(10) < 4) "hot" else s"cold${rnd.nextInt(200)}")
    val df = items.toDF("item").repartition(7) // force multi-partition merges
    val k = 9
    val exact = items.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val heavy = exact.collect { case (t, c) if c * (k + 1) > items.size => t }.toSet
    val out = HeavyHitters.exactHeavyHitters(df, "item", k)
      .as[(String, Long, Long)].collect()
    assert(out.map(_._1).toSet === heavy)
    out.foreach { case (t, c, n) =>
      assert(c === exact(t)); assert(n === items.size.toLong)
    }
  }

  test("vocab coverage: exact in-vocab ratio with OOV and left-join nulls") {
    val docs = Seq(
      (1L, "a b c d"),   // 2/4 in vocab
      (2L, "a a a b"),   // 4/4
      (3L, "x y z"))     // 0/3
      .toDF("doc_id", "text")
    val vocab = Seq("a", "b").toDF("term")
    val out = TextSearch.vocabCoverage(docs, "doc_id", "text", vocab)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    assert(out === Seq(
      (1L, 4L, 2L, 0.5), (2L, 4L, 4L, 1.0), (3L, 3L, 0L, 0.0)))
  }

  test("reserved-column guards fail fast") {
    val bad = Seq((1L, 2L, "a")).toDF("user_id", "__t1", "event_type")
    intercept[IllegalArgumentException] {
      Funnel.funnelSteps(bad, "user_id", "__t1", "event_type", Seq("a"))
    }
    val bad2 = Seq((1L, 2L)).toDF("user_id", "__d")
    intercept[IllegalArgumentException] {
      Funnel.retentionCohorts(bad2, "user_id", col("__d"))
    }
  }
}
