package graft

import java.nio.file.Files

import graft.operators.SkewJoin
import graft.sinks.Exports
import org.apache.spark.sql.functions._

/** S10/S11 export sinks and the scale toolbox (salted skew join, bucketed
  * co-located join). The bucketing test is the 100 TB claim made checkable:
  * two tables bucketed on the join key join with NO shuffle exchange. */
class ScaleToolsSpec extends SparkSpec {
  import spark.implicits._

  test("S10: roster/stock CSV export round-trips with reference headers") {
    val roster = Seq(("Jane Doe", "Acme", "", "acme.com", "ACM", "Tech", true, false))
      .toDF("ceo", "company", "ceo_alias", "websites", "stock", "sector",
        "company_favorite", "ceo_favorite")
    val dir = Files.createTempDirectory("graft-csv").toString
    Exports.writeSingleCsv(Exports.rosterCsvFrame(roster), s"$dir/roster")
    val back = spark.read.option("header", "true").csv(s"$dir/roster")
    assert(back.columns.toSeq == Seq("CEO", "Company", "CEO Alias", "Websites",
      "Stock", "Sector", "Company Favorite", "CEO Favorite"))
    assert(back.count() == 1)

    val stockRows = Seq(("ACM", "Acme", 10.0, 1.5, 2.5,
      Seq(100.0, 101.5), Seq("2025-03-01", "2025-03-02"), "2025-03-02 09:00:00"))
      .toDF("ticker", "company", "opening_price", "daily_change_pct",
        "seven_day_change_pct", "price_history", "date_history", "last_updated")
    Exports.writeSingleCsv(Exports.stockCsvFrame(stockRows), s"$dir/stock")
    val stockBack = spark.read.option("header", "true").csv(s"$dir/stock").collect()(0)
    assert(stockBack.getAs[String]("price_history") == "100.0|101.5")
    assert(stockBack.getAs[String]("date_history") == "2025-03-01|2025-03-02")
  }

  test("S11: JSON-lines export round-trips typed rows") {
    val df = Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("id", "name", "v")
    val dir = Files.createTempDirectory("graft-json").toString
    Exports.writeJson(df, s"$dir/out")
    val back = spark.read.json(s"$dir/out")
    assert(back.count() == 2)
    assert(back.filter(col("name") === "a").collect()(0).getAs[Double]("v") == 2.5)
  }

  test("salted join == plain join on skewed data (both variants)") {
    // 90% of fact rows share one hot key
    val fact = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k${i % 7}", i))
      .toDF("k", "v")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"), ("k3", "C"),
      ("k4", "D"), ("k5", "E"), ("k6", "F"), ("k0", "Z")).toDF("k", "label")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "label").as[(String, Int, String)].collect().sorted.toSeq
    val plain = canon(fact.join(dim, Seq("k")))
    assert(canon(SkewJoin.saltedJoin(fact, dim, Seq("k"), saltBuckets = 8)) == plain)
    assert(canon(SkewJoin.saltedJoinHotKeys(fact, dim, Seq("k"),
      hotKeys = Seq("hot"), saltBuckets = 8)) == plain)

    // the salt actually spreads the hot key across buckets
    val spread = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(8L)))
      .filter(col("k") === "hot").select("__salt").distinct().count()
    assert(spread >= 6, s"hot key must scatter over most buckets ($spread)")

    // left join keeps unmatched LARGE rows exactly once...
    val factX = fact.unionByName(Seq(("nokey", -1)).toDF("k", "v"))
    def canonL(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "label").as[(String, Int, Option[String])]
        .collect().sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(canonL(SkewJoin.saltedJoin(factX, dim, Seq("k"), saltBuckets = 8,
      joinType = "left")) == canonL(factX.join(dim, Seq("k"), "left")))
    // ...and join types that would emit unmatched SMALL rows are rejected
    for (jt <- Seq("right", "right_outer", "full", "full_outer"))
      assertThrows[IllegalArgumentException] {
        SkewJoin.saltedJoin(fact, dim, Seq("k"), saltBuckets = 8, joinType = jt)
      }
  }

  test("bucketed tables co-locate: join plans with no shuffle exchange") {
    // session warehouse dir (static conf) — tables dropped in finally
    spark.sql("DROP TABLE IF EXISTS bucketed_a")
    spark.sql("DROP TABLE IF EXISTS bucketed_b")
    val a = (1 to 500).map(i => (i.toLong, s"a$i")).toDF("id", "pa")
    val b = (1 to 500).map(i => (i.toLong, s"b$i")).toDF("id", "pb")
    a.write.bucketBy(8, "id").sortBy("id").saveAsTable("bucketed_a")
    b.write.bucketBy(8, "id").sortBy("id").saveAsTable("bucketed_b")
    try {
      // bucketed join must not add Exchange on either side (pre-shuffled
      // on disk — the co-located-join capability for repeated big joins)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        "bucketed-bucketed join must be shuffle-free:\n" + plan.take(2000))
      assert(joined.count() == 500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }

  test("sketch rollup: merge path == direct path exactly; idempotent; 5% of exact") {
    import graft.operators.SketchRollup
    val rnd = new scala.util.Random(7)
    val facts = (1 to 20000).map { _ =>
      val day = 1 + rnd.nextInt(14)
      (day, (day - 1) / 7 + 1, s"u${rnd.nextInt(3000)}")
    }.toDF("day", "week", "user_id")

    val daily = SketchRollup.sketchByKey(facts, Seq("day", "week"), "user_id")
    val weekly = SketchRollup.rollup(daily, Seq("week"))
      .as[(Int, Double, Long)].collect().sortBy(_._1).toSeq

    // merge path == ONE sketch straight over the raw week (registers are
    // order-free maxima -> bit-identical estimates, not just close)
    val direct = facts.groupBy("week")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)).as("approx_distinct"),
        count(lit(1)).as("n_rows"))
      .as[(Int, Double, Long)].collect().sortBy(_._1).toSeq
    assert(weekly == direct)

    // idempotent under replay: a duplicated daily partition changes nothing
    val dupDaily = daily.unionAll(daily.filter(col("day") === 3))
    val replayed = SketchRollup.rollup(dupDaily.drop("n_rows")
      .withColumn("n_rows", lit(0L)), Seq("week"))
      .as[(Int, Double, Long)].collect().sortBy(_._1).map(r => (r._1, r._2)).toSeq
    assert(replayed == weekly.map(r => (r._1, r._2)))

    // accuracy envelope vs the exact rollup
    val exact = facts.groupBy("week").agg(countDistinct(col("user_id")).as("d"))
      .as[(Int, Long)].collect().toMap
    for ((wk, est, _) <- weekly)
      assert(math.abs(est - exact(wk)) / exact(wk).toDouble < 0.05,
        s"week $wk: est $est vs exact ${exact(wk)}")

    // exactly-additive row counts survive the merge
    assert(weekly.map(_._3).sum == 20000L)
  }

  test("kll quantile rollup: merged estimates land in the rank-error envelope") {
    import graft.operators.SketchRollup
    val rnd = new scala.util.Random(11)
    // skewed values so p50/p95 differ materially; 14 daily partitions
    val facts = (1 to 40000).map { _ =>
      val day = 1 + rnd.nextInt(14)
      (day, (day - 1) / 7 + 1, math.pow(rnd.nextDouble(), 3) * 1000.0)
    }.toDF("day", "week", "v")

    val daily = SketchRollup.quantileSketchByKey(facts, Seq("day", "week"), "v")
    val probs = Seq(0.5, 0.95)
    val weekly = SketchRollup.quantileRollup(daily, Seq("week"), probs)
      .as[(Int, Seq[Double], Long)].collect().sortBy(_._1)

    // envelope check against the EXACT empirical CDF: the estimate's true
    // rank must sit within ~2x the k=200 rank error (1.65%) of the target
    val byWeek = facts.as[(Int, Int, Double)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._3).sorted).toMap
    for ((wk, qs, n) <- weekly; (p, est) <- probs.zip(qs)) {
      val vals = byWeek(wk)
      val rank = vals.count(_ <= est).toDouble / vals.length
      assert(math.abs(rank - p) < 0.033, s"week $wk p$p: est $est has rank $rank")
      assert(n == vals.length.toLong)
    }

    // null-safe: an all-null group rolls up to null, not a crash
    val withNull = Seq((99, 99, null.asInstanceOf[java.lang.Double]))
      .toDF("day", "week", "v")
    val nullRoll = SketchRollup.quantileRollup(
      SketchRollup.quantileSketchByKey(withNull, Seq("day", "week"), "v"),
      Seq("week"), probs)
    assert(nullRoll.where(col("approx_q").isNull).count() == 1)
  }

  test("cms frequency rollup: merged == direct exactly; never undercounts; replay double-counts") {
    import graft.operators.SketchRollup
    val rnd = new scala.util.Random(13)
    // zipf-ish key draw over 14 daily partitions
    val facts = (1 to 20000).map { _ =>
      val day = 1 + rnd.nextInt(14)
      (day, (day - 1) / 7 + 1, s"k${(math.pow(rnd.nextDouble(), 2) * 500).toInt}")
    }.toDF("day", "week", "k")
    val probes = Seq("k0", "k1", "k42", "k400", "nope")

    val daily = SketchRollup.freqSketchByKey(facts, Seq("day", "week"), "k")
    val weekly = SketchRollup.freqRollup(daily, Seq("week"), probes)
      .as[(Int, Seq[Long], Long)].collect().sortBy(_._1).toSeq

    // merged path == one sketch straight over the raw week: CMS cells are
    // additive sums, so partitioning commutes BIT-identically
    val direct = SketchRollup.freqRollup(
      SketchRollup.freqSketchByKey(facts, Seq("week"), "k"), Seq("week"), probes)
      .as[(Int, Seq[Long], Long)].collect().sortBy(_._1).toSeq
    assert(weekly == direct)

    // one-sided error: estimate >= exact, overcount within ~eps*N
    val exact = facts.as[(Int, Int, String)].collect()
      .groupBy(_._2).view.mapValues(_.groupBy(_._3).view.mapValues(_.length.toLong).toMap).toMap
    for ((wk, ests, n) <- weekly; (item, est) <- probes.zip(ests)) {
      val truth = exact(wk).getOrElse(item, 0L)
      assert(est >= truth, s"week $wk $item: CMS must never undercount ($est < $truth)")
      assert(est - truth <= (0.01 * n).toLong + 1,
        s"week $wk $item: overcount ${est - truth} exceeds envelope")
    }
    assert(weekly.map(_._3).sum == 20000L)

    // NOT idempotent (unlike HLL registers): replaying a partition adds
    // its counters again — the exactly-once contract, pinned out loud
    val dup = daily.unionAll(daily.where(col("day") === 3))
    val replayed = SketchRollup.freqRollup(dup, Seq("week"), Seq("k0"))
      .as[(Int, Seq[Long], Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val clean = weekly.map(r => r._1 -> r._2.head).toMap
    val day3week = 1
    assert(replayed(day3week)._1.head >= clean(day3week),
      "replayed partition must not shrink the estimate")
    assert(replayed.keys.toSet == clean.keySet)
  }

  test("join-size estimate == materialized join count; hot key surfaces first") {
    import graft.operators.SkewJoin
    val left = (Seq.fill(50)(7) ++ Seq(1, 1, 2, 3, 3, 3, 9)).toDF("k")
    val right = (Seq.fill(40)(7) ++ Seq(1, 3, 3, 4)).toDF("k")
    val got = SkewJoin.joinSizeEstimate(left, right, "k", topK = 2)
      .as[(Long, Long, Long, String)].collect().head
    val actual = left.join(right, "k").count()
    assert(got._1 == actual)                   // 2000 + 2 + 6 = exact join size
    assert(got._2 == 3L)                       // keys 1, 3, 7 match (9 and 4 don't)
    assert(got._3 == 2000L && got._4 == "7:2000|3:6")
    // null keys never match (SQL join semantics)
    val gn = SkewJoin.joinSizeEstimate(
      Seq(Some(1), None).toDF("k"), Seq(Some(1), None).toDF("k"), "k")
      .as[(Long, Long, Long, String)].collect().head
    assert(gn._1 == 1L && gn._2 == 1L)
    // zero-match input still emits ONE row of coalesced zeros + empty
    // top_keys (the q83 oracle contract — both sides must agree on this
    // edge, not just the populated path)
    val gz = SkewJoin.joinSizeEstimate(
      Seq(1, 2).toDF("k"), Seq(3, 4).toDF("k"), "k")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(gz == Seq((0L, 0L, 0L, "")))
  }

  test("compaction: report flags fragmented partitions; compactTo merges without shuffle") {
    import graft.operators.Layout
    val base = Files.createTempDirectory("graft-compact").toString
    // partition d=1: 8 tiny files; partition d=2: 1 file
    (1 to 1000).map(i => (i, 1)).toDF("v", "d").repartition(8)
      .write.partitionBy("d").mode("append").parquet(s"$base/t")
    (1 to 10).map(i => (i, 2)).toDF("v", "d").coalesce(1)
      .write.partitionBy("d").mode("append").parquet(s"$base/t")

    val rep = Layout.compactionReport(spark, s"$base/t", targetBytes = 1L << 26)
      .as[(String, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(rep.map(r => (r._1, r._2)) == Seq(("d=1", 8L), ("d=2", 1L)))
    assert(rep.forall(_._4 == 1L)) // tiny bytes -> one target file each
    assert(rep.map(_._5) == Seq(true, false)) // only d=1 needs compaction

    Layout.compactTo(spark, s"$base/t/d=1", s"$base/compacted/d=1", 1)
    val after = Layout.compactionReport(spark, s"$base/compacted", 1L << 26)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(after.map(r => (r._1, r._2, r._5)) == Seq(("d=1", 1L, false)))
    // content survives byte-for-byte
    assert(spark.read.parquet(s"$base/compacted/d=1").count() == 1000)
    // second write to the same dest refuses (never clobber a rewrite target)
    intercept[Exception](
      Layout.compactTo(spark, s"$base/t/d=1", s"$base/compacted/d=1", 1))
  }

  test("reserved internal column names are refused, not silently replaced") {
    val bad = Seq((1, 2)).toDF("k", "__salt")
    val ok = Seq((1, 2)).toDF("k", "v")
    intercept[IllegalArgumentException](SkewJoin.saltedJoin(bad, ok, Seq("k")))
    intercept[IllegalArgumentException](SkewJoin.saltedJoinHotKeys(ok, bad, Seq("k"), Seq(1)))
    val binned = Seq((1, 0L, 5L)).toDF("k", "s", "__bin")
    intercept[IllegalArgumentException](graft.operators.RangeJoin.pointsInIntervals(
      Seq((1, 2L)).toDF("k", "p"), binned, Seq("k"), "p", "s", "__bin", 10L))
    intercept[IllegalArgumentException](graft.operators.Sharding.assignShards(
      Seq((1, 2)).toDF("id", "__k"), "id", epoch = 1, numShards = 4))
    intercept[IllegalArgumentException](graft.operators.Chunking.packSequences(
      Seq((1, 2L, 3L)).toDF("d", "__cum", "n"), Seq("d"), "d", "n", budget = 10))
    intercept[IllegalArgumentException](graft.operators.Layout.zOrdered(
      Seq((1, 2, 3L)).toDF("x", "y", "__z"), "x", "y", bits = 4, numRanges = 2))
  }

  test("zone-map pruning: envelope overlap decides the scan set; clustered layout prunes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // values 0..99 in insert order; zone = id bucket of 10 → each zone's
    // envelope is tight, so a [30, 49] predicate scans exactly 2 zones
    val clustered = (0 until 100).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val gotC = graft.operators.Layout.pruningReport(clustered,
      ((col("id") - pmod(col("id"), lit(10L))) / lit(10L)).cast("long"),
      col("v"), lit(30L), lit(49L))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(gotC == ((10L, 2L, 100L, 20L, 20L)))
    // same rows, adversarial layout: zone = id % 10 striping → every zone's
    // envelope spans [zone, 90+zone], all 10 must scan for the same answer
    val striped = graft.operators.Layout.pruningReport(clustered, pmod(col("id"), lit(10L)),
      col("v"), lit(30L), lit(49L))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(striped == ((10L, 10L, 100L, 100L, 20L)))
    // degenerate: no-overlap predicate scans nothing; nulls drop out
    val gotE = graft.operators.Layout.pruningReport(
      Seq((Some(1L), Some(5L)), (None, Some(9L)), (Some(2L), None)).toDF("id", "v"),
      col("id"), col("v"), lit(100L), lit(200L))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(gotE == ((1L, 0L, 1L, 0L, 0L)))
    intercept[IllegalArgumentException](graft.operators.Layout.pruningReport(
      Seq((1L, 2L)).toDF("__zm_z", "v"), col("__zm_z"), col("v"), lit(0L), lit(1L)))
  }
}
