package graft

import graft.operators.Profiling
import org.apache.spark.sql.functions._

/** The scale-safe exact profile must agree bit-for-bit with the
  * buffer-everything formulation it replaced (exact `percentile` +
  * `countDistinct` in one agg), and its plan must stay free of the two
  * scale killers: Expand and value-buffering percentile aggregation. */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def referenceProfile(
      df: org.apache.spark.sql.DataFrame, cols: Seq[String]): Map[String, Row6] =
    cols.map { c =>
      val r = df.agg(
        count(col(c)).as("n"),
        count(lit(1)).as("rows"),
        countDistinct(col(c)).as("d"),
        min(col(c)).cast("double").as("mn"),
        max(col(c)).cast("double").as("mx"),
        percentile(col(c), lit(0.5)).as("med")).collect()(0)
      c -> Row6(r.getLong(0), r.getLong(1) - r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))
    }.toMap

  case class Row6(n: Long, nNull: Long, d: Long,
      mn: Option[Double], mx: Option[Double], med: Option[Double])

  private def got(df: org.apache.spark.sql.DataFrame, cols: Seq[String]): Map[String, Row6] =
    Profiling.profileNumeric(df, cols).collect().map { r =>
      r.getString(0) -> Row6(r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)))
    }.toMap

  test("exact profile == percentile/countDistinct reference on lineitem") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    assert(got(li, cols) == referenceProfile(li, cols))
  }

  test("exact profile handles nulls, all-null columns, and odd/even counts") {
    val df = Seq[(Option[Double], Option[Double], Option[Double])](
      (Some(1.0), None, Some(5.0)),
      (Some(2.0), None, Some(5.0)),
      (Some(2.0), None, Some(7.0)),
      (Some(10.0), None, None)
    ).toDF("a", "b", "c")
    val g = got(df, Seq("a", "b", "c"))
    assert(g("a") == Row6(4, 0, 3, Some(1.0), Some(10.0), Some(2.0)))
    assert(g("b") == Row6(0, 4, 0, None, None, None))
    // c: even count {5,5,7} -> n=3 odd -> median 5
    assert(g("c") == Row6(3, 1, 2, Some(5.0), Some(7.0), Some(5.0)))
    assert(g == referenceProfile(df, Seq("a", "b", "c")))
  }

  test("randomized: refinement medians == percentile across distributions") {
    val rnd = new scala.util.Random(7)
    // heavy duplication, skew, negatives, wide magnitude spread
    val data = (1 to 5000).map { _ =>
      rnd.nextInt(4) match {
        case 0 => (rnd.nextInt(10).toDouble, rnd.nextDouble() * 1e9 - 5e8)
        case 1 => (42.0, math.pow(10, rnd.nextInt(12)) * rnd.nextDouble())
        case 2 => (rnd.nextGaussian() * 1e-6, -rnd.nextInt(3).toDouble)
        case _ => (rnd.nextDouble(), rnd.nextDouble())
      }
    }
    val df = data.toDF("x", "y")
    assert(got(df, Seq("x", "y")) == referenceProfile(df, Seq("x", "y")))
  }

  test("exactMedianByKey == grouped percentile (q11 kernel)") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val expRows = orders.groupBy("o_orderpriority")
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("m"))
      .as[(String, Double)].collect().toMap
    val gotRows = Profiling.exactMedianByKey(orders, "o_orderpriority", "o_totalprice")
      .as[(String, Double)].collect().toMap
    assert(gotRows == expRows)
  }

  test("exactQuantilesByKey == percentile at arbitrary probs, incl. 0 and 1") {
    val rnd = new scala.util.Random(23)
    val data = (1 to 3000).map(_ =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(3) match {
        case 0 => rnd.nextInt(20).toDouble
        case 1 => rnd.nextDouble() * 1e6
        case _ => -rnd.nextGaussian() * 1e-3
      }))
    val df = data.toDF("g", "x")
    val probs = Seq(0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0)
    val exp = df.groupBy("g")
      .agg(percentile(col("x"), typedLit(probs)).as("q"))
      .as[(String, Seq[Double])].collect()
      .flatMap { case (g, qs) => probs.zip(qs).map { case (p, v) => (g, p, v) } }
      .toSet
    val got = Profiling.exactQuantilesByKey(df, "g", "x", probs)
      .as[(String, Double, Double)].collect().toSet
    assert(got == exp)
  }

  test("sketch mode: exact min/max/n, HLL cardinality within tolerance, median near exact") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice")
    val exact = got(li, cols)
    val approx = Profiling.profileNumeric(li, cols, exact = false).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
    }.toMap
    for (c <- cols) {
      val e = exact(c)
      val (n, d, mn, mx, med) = approx(c)
      assert(n == e.n && mn == e.mn.get && mx == e.mx.get, s"$c n/min/max must stay exact")
      // default rsd 0.05 is a standard deviation, not a bound — allow 2 sigma
      assert(math.abs(d - e.d).toDouble / e.d <= 0.10, s"$c HLL err ${d} vs ${e.d}")
      // rank error of percentile_approx(acc=10000) is tiny; bound loosely by value
      val spanFrac = math.abs(med - e.med.get) / (e.mx.get - e.mn.get)
      assert(spanFrac <= 0.01, s"$c approx median $med vs ${e.med.get}")
    }
  }

  test("plan: the melted grain is the only shuffle — no Expand, no percentile buffers") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val p = Profiling.meltedGrouped(li, cols).queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), "melt must not plan Expand:\n" + p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "one map-side-combined shuffle:\n" + p.take(1500))
    assert(p.contains("HashAggregate"), "distinct-value grain must hash-aggregate")
    // the public result is a materialized local relation: every heavy job
    // already ran through the melted grain above
    val res = Profiling.profileNumeric(li, cols)
    val rp = res.queryExecution.executedPlan.toString
    assert(rp.contains("LocalTableScan"), rp.take(500))
    // sketch mode stays lazy and Expand-free too
    val ap = Profiling.profileNumeric(li, cols, exact = false)
      .queryExecution.executedPlan.toString
    assert(!ap.contains("Expand"), "approx mode must not plan Expand:\n" + ap.take(1500))
  }

  test("categorical profile: nulls, count-desc/value tie-break, bounded top-k window") {
    val df = Seq(
      ("en", "web"), ("en", "web"), ("en", "books"), ("de", "books"),
      ("de", null), ("fr", null), (null, "web")
    ).toDF("lang", "source")
    val got = Profiling.profileCategorical(df, Seq("lang", "source"), topK = 2)
      .as[(String, Long, Long, Long, String)].collect().toSeq
    // lang: 7 rows, 1 null, 3 distinct; top2 = en:3 then de:2 (fr:1 cut)
    // source: 7 rows, 2 null, 2 distinct; web:3 then books:2
    assert(got == Seq(
      ("lang", 7L, 1L, 3L, "en:3|de:2"),
      ("source", 7L, 2L, 2L, "web:3|books:2")))
    // tie on count falls back to value order
    val tie = Profiling.profileCategorical(
      Seq("b", "a", "a", "b").toDF("k"), Seq("k"), topK = 2)
      .as[(String, Long, Long, Long, String)].collect().toSeq
    assert(tie == Seq(("k", 4L, 0L, 2L, "a:2|b:2")))

    // all-null column keeps its summary row with a null top_values
    val gn = Profiling.profileCategorical(
      Seq((Option.empty[String], "x")).toDF("a", "b"), Seq("a"), topK = 2)
      .as[(String, Long, Long, Long, Option[String])].collect().toSeq
    assert(gn == Seq(("a", 1L, 1L, 0L, None)))

    // scale posture: no Expand anywhere; the rank window is group-limited
    val p = Profiling.profileCategorical(df, Seq("lang", "source"), 5)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), p.take(1500))
    assert(p.contains("WindowGroupLimit"), "top-k window must push a group limit:\n" + p.take(1500))
  }

  test("iqrOutliers: exact quartile fences, null values excluded, zero-IQR degenerate") {
    import spark.implicits._
    // key "a": 0..100 plus spikes at ±1000 → IQR fences catch exactly the spikes
    // key "b": all-equal values → IQR 0 → fences collapse to the value, no outliers
    // key "c": carries nulls that must not count anywhere
    val rows =
      (0 to 100).map(i => ("a", Some(i.toDouble))) ++
        Seq(("a", Some(-1000.0)), ("a", Some(1000.0)), ("a", Some(1001.0))) ++
        (1 to 9).map(_ => ("b", Some(7.0))) ++
        Seq(("c", None: Option[Double]), ("c", Some(1.0)), ("c", Some(2.0)))
    val df = rows.toDF("k", "v")
    val got = Profiling.iqrOutliers(df, "k", "v")
      .select("k", "n", "n_low", "n_high", "n_outliers")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 104L, 1L, 2L, 3L), ("b", 9L, 0L, 0L, 0L), ("c", 2L, 0L, 0L, 0L)))
    // fences derive from the exact R-7 quartiles of the 104-value set
    val a = Profiling.iqrOutliers(df, "k", "v").where($"k" === "a")
      .select("q1", "q3").as[(Double, Double)].head()
    // order statistics of sorted values at pos p*(n-1): n=104
    val sorted = ((0 to 100).map(_.toDouble) ++ Seq(-1000.0, 1000.0, 1001.0)).sorted
    def r7(p: Double): Double = {
      val pos = p * (sorted.size - 1); val lo = pos.toInt
      val frac = pos - lo
      if (lo + 1 < sorted.size) sorted(lo) * (1 - frac) + sorted(lo + 1) * frac else sorted(lo)
    }
    assert(a == ((r7(0.25), r7(0.75))))
  }

  test("weightedQuantilesByKey: cumulative-weight selection, exact integers") {
    import spark.implicits._
    // key "a": values 1..4 with weights 1,1,6,2 (W=10):
    //   p50 -> target 5 -> first cum >= 5 is v=3 (cum 8); p90 -> target 9 -> v=4
    // key "b": uniform weights degenerate to the unweighted lower median
    // nulls/zero weights must not count anywhere
    val df = Seq(
      ("a", Some(1.0), Some(1L)), ("a", Some(2.0), Some(1L)),
      ("a", Some(3.0), Some(6L)), ("a", Some(4.0), Some(2L)),
      ("a", Some(9.0), Some(0L)), ("a", None, Some(5L)), ("a", Some(5.0), None),
      ("b", Some(10.0), Some(2L)), ("b", Some(20.0), Some(2L))
    ).toDF("k", "v", "w")
    val got = Profiling.weightedQuantilesByKey(df, "k", "v", "w", Seq(0.5, 0.9))
      .orderBy("k", "prob")
      .as[(String, Double, Double, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 0.5, 3.0, 10L), ("a", 0.9, 4.0, 10L),
      ("b", 0.5, 10.0, 4L), ("b", 0.9, 20.0, 4L)))
    // duplicated values pre-aggregate: two (a, 3.0) rows of weight 3 each
    // behave exactly like one row of weight 6
    val dup = Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 3L),
      ("a", 3.0, 3L), ("a", 4.0, 2L)).toDF("k", "v", "w")
    val got2 = Profiling.weightedQuantilesByKey(dup, "k", "v", "w", Seq(0.5))
      .as[(String, Double, Double, Long)].head()
    assert(got2 == (("a", 0.5, 3.0, 10L)))
    intercept[IllegalArgumentException](
      Profiling.weightedQuantilesByKey(df, "k", "v", "w", Seq(0.0)))
  }

  test("madOutliers: exact median/MAD fences, nulls excluded, zero-MAD degenerate") {
    import spark.implicits._
    // key "a": 0..100 plus symmetric ±1000 spikes → med 50, MAD 26,
    //   fences [-28, 128] catch exactly the two spikes (IQR would too,
    //   but MAD's breakdown point is the reason this operator exists)
    // key "b": all-equal values → MAD 0 → fences collapse, no outliers
    // key "c": interpolated median (even n) + nulls that must not count
    val rows =
      (0 to 100).map(i => ("a", Some(i.toDouble))) ++
        Seq(("a", Some(-1000.0)), ("a", Some(1000.0))) ++
        (1 to 9).map(_ => ("b", Some(7.0))) ++
        Seq(("c", None: Option[Double]), ("c", Some(1.0)), ("c", Some(5.0)))
    val df = rows.toDF("k", "v")
    val got = Profiling.madOutliers(df, "k", "v")
      .select("k", "n", "med", "mad", "lo", "hi", "n_low", "n_high", "n_outliers")
      .as[(String, Long, Double, Double, Double, Double, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      ("a", 103L, 50.0, 26.0, -28.0, 128.0, 1L, 1L, 2L),
      ("b", 9L, 7.0, 0.0, 7.0, 7.0, 0L, 0L, 0L),
      ("c", 2L, 3.0, 2.0, -3.0, 9.0, 0L, 0L, 0L)))
    // reserved-column contract
    intercept[IllegalArgumentException] {
      Profiling.madOutliers(df.withColumn("mad", lit(1)), "k", "v")
    }
  }
}
