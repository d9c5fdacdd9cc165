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

  test("transition counts: lag pairs, exact conditional probabilities") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "a"), (2L, 3L, "c"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.transitionCounts(ev, "user_id", Seq(col("ts")), "event_type")
      .orderBy("prev_type", "event_type")
      .as[(String, String, Long, Double)].collect()
    // user1: a→b, b→a, a→b; user2: a→a, a→c
    assert(out === Seq(
      ("a", "a", 1L, 0.25), ("a", "b", 2L, 0.5), ("a", "c", 1L, 0.25),
      ("b", "a", 1L, 1.0)))
  }

  test("transition counts: first event per user contributes no pair") {
    val ev = Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("user_id", "ts", "event_type")
    assert(Funnel.transitionCounts(ev, "user_id", Seq(col("ts")), "event_type")
      .count() === 0L)
  }

  test("rfm: metrics exact, tiles reproduce ntile floor distribution") {
    // 6 users, distinct metric orders; tiles=2 → lower half tile 1
    val ev = (1L to 6L).flatMap { u =>
      // user u: all events on day u (86400000000000 ns per day), u events,
      // value u dollars each → monetary u²
      (1L to u).map(_ => (u, u * 86400000000000L, u.toDouble))
    }.toDF("user_id", "ts", "value")
    val out = Funnel.rfm(ev, "user_id",
      Funnel.epochDayFromNanos(col("ts")), col("value"), tiles = 2)
      .orderBy("user_id")
      .select("user_id", "recency_days", "frequency", "monetary",
        "r_tile", "f_tile", "m_tile", "segment")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
    // recency: user 6 has day 6 = global max → 0 days; user 1 → 5 days.
    // frequency/monetary ascend with u → users 1-3 tile 1, 4-6 tile 2;
    // recency descends with u → users 6,5,4 tile 1 (most recent)
    assert(out === Seq(
      (1L, 5L, 1L, 1.0, 2L, 1L, 1L, "2-1-1"),
      (2L, 4L, 2L, 4.0, 2L, 1L, 1L, "2-1-1"),
      (3L, 3L, 3L, 9.0, 2L, 1L, 1L, "2-1-1"),
      (4L, 2L, 4L, 16.0, 1L, 2L, 2L, "1-2-2"),
      (5L, 1L, 5L, 25.0, 1L, 2L, 2L, "1-2-2"),
      (6L, 0L, 6L, 36.0, 1L, 2L, 2L, "1-2-2")))
  }

  test("incremental funnel: folding time-ordered batches == full recompute") {
    val rnd = new scala.util.Random(11)
    val types = Seq("a", "b", "c", "x")
    // 40 users × ~50 events at distinct timestamps, random types
    val all = (1L to 2000L).map { t =>
      (rnd.nextInt(40).toLong, t, types(rnd.nextInt(types.length)))
    }
    val full = all.toDF("user_id", "ts", "event_type")
    val expected = Funnel.funnelSteps(
      full, "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .orderBy("user_id").collect().map(_.toSeq)
    // fold in 4 time-ordered slices (uneven cuts, some users absent per slice)
    val cuts = Seq(0L, 137L, 800L, 1501L, 2001L)
    val st = cuts.sliding(2).foldLeft(
      Funnel.funnelSteps(full.limit(0), "user_id", "ts", "event_type",
        Seq("a", "b", "c"))) { case (state, Seq(lo, hi)) =>
      Funnel.updateFunnelState(state,
        full.filter(col("ts") >= lo && col("ts") < hi),
        "user_id", "ts", "event_type", Seq("a", "b", "c"))
    }
    assert(st.orderBy("user_id").collect().map(_.toSeq) === expected)
  }

  test("incremental funnel: state-only users pass through unchanged") {
    val s0 = Funnel.funnelSteps(
      Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 3L, "a"))
        .toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", Seq("a", "b", "c"))
    val s1 = Funnel.updateFunnelState(s0,
      Seq((2L, 10L, "b"), (3L, 11L, "a")).toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getLong(4)))
    assert(s1 === Seq(
      (1L, Some(1L), Some(2L), None, 2L), // untouched by the batch
      (2L, Some(3L), Some(10L), None, 2L), // step 2 settles from the batch
      (3L, Some(11L), None, None, 1L))) // brand-new user
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

  test("q167 repurchase curve matches a JVM gap replay") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q167_repurchase_curve")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val purchases = graft.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        (col("ts").cast("decimal(20,0)") / 1000).cast("long").as("t"),
        col("event_id"))
      .as[(Long, Long, Long)].collect()
    val gaps = purchases.groupBy(_._1).values.flatMap { rs =>
      val s = rs.sortBy(r => (r._2, r._3))
      s.sliding(2).collect { case Array(a, b) => b._2 - a._2 }
    }.toSeq
    val day = 86400000000L
    val want = Seq(1, 7, 14, 30).map { k =>
      val c = gaps.count(_ <= k * day).toLong
      (k.toLong, gaps.size.toLong, c, c * 1000000L / gaps.size)
    }
    assert(got == want, s"got=$got want=$want")
  }
}
