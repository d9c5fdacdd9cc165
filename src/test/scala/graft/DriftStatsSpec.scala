package graft

import graft.operators.{Drift, Profiling, Rollups}
import org.apache.spark.sql.functions._

/** Hand-checked/brute-forced kernels for the statistics wave: exact KS
  * drift (q155), Spearman midrank correlation (q156), Benford audit
  * (q157). */
class DriftStatsSpec extends SparkSpec {
  import spark.implicits._

  test("ksAgainstPool matches the brute-force integer sup on corpus data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("source"), size(split(trim(col("text")), "\\s+")).cast("long").as("v"))
    val got = Drift.ksAgainstPool(docs, "source", "v")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val rows = docs.as[(String, Long)].collect()
    val np = rows.length.toLong
    val poolSorted = rows.map(_._2).sorted
    for ((src, rs) <- rows.groupBy(_._1)) {
      val ns = rs.length.toLong
      val vs = rs.map(_._2).sorted
      val mn = poolSorted.distinct.map { v =>
        val cums = vs.count(_ <= v).toLong
        val cump = poolSorted.count(_ <= v).toLong
        math.abs(cums * np - cump * ns)
      }.max
      assert(got(src) == ((ns, mn * 1000000L / (ns * np))), s"source $src")
    }
  }

  test("ksTwoSample: hand case, symmetry, identical = 0, disjoint = 1e6") {
    val a = Seq(1L, 2L, 3L).toDF("v")
    val b = Seq(3L, 4L, 4L).toDF("v")
    // sup at v=2: |2*3 - 0*3| = 6 -> 6e6/9 = 666666
    val r = Drift.ksTwoSample(a, b, "v").as[(Long, Long, Long)].head()
    assert(r == ((3L, 3L, 666666L)))
    val r2 = Drift.ksTwoSample(b, a, "v").as[(Long, Long, Long)].head()
    assert(r2._3 == r._3, "KS is symmetric")
    assert(Drift.ksTwoSample(a, a, "v").as[(Long, Long, Long)].head()._3 == 0L)
    val c = Seq(10L, 11L).toDF("v")
    assert(Drift.ksTwoSample(a, c, "v").as[(Long, Long, Long)].head()._3 == 1000000L)
  }

  test("ksAgainstPool: identical per-key distributions score 0") {
    val df = (Seq.fill(3)(("a", 1L)) ++ Seq.fill(2)(("a", 5L)) ++
      Seq.fill(3)(("b", 1L)) ++ Seq.fill(2)(("b", 5L))).toDF("k", "v")
    val got = Drift.ksAgainstPool(df, "k", "v")
      .select("ks_ppm").as[Long].collect()
    assert(got.toSeq == Seq(0L, 0L))
  }

  test("spearman saturates on any monotone relation where pearson does not") {
    val rows = (1L to 20L).map(i => ("m", i, i * i * i)) ++
      (1L to 20L).map(i => ("r", i, -(i * i)))
    val df = rows.toDF("k", "x", "y")
    val rho = Rollups.spearmanByKey(df, "k", "x", "y")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(rho("m") == 1.0 && rho("r") == -1.0, rho.toString)
    val pear = Rollups.pearsonByKey(df.filter($"k" === "m"), "k", "x", "y", scale = 0)
      .select("r").as[Double].collect().head
    assert(pear < 0.95, s"cubic growth should drag pearson below 0.95: $pear")
  }

  test("spearmanByKey two-level ranks: negative values and bucket-boundary ties") {
    // values straddle the 2^16 bucket boundary and include negatives —
    // the r13 two-level prefix sum must rank them identically to the
    // single-window formulation (arithmetic shiftright is monotonic on
    // negatives; carries cross bucket edges)
    val vals = Seq(-200000L, -65536L, -1L, 0L, 1L, 65535L, 65536L, 65537L,
      131072L, 200000L, 65536L, -1L) // dup values -> midrank ties
    val rows = vals.zipWithIndex.map { case (v, i) => ("k", v, (i * 7 % 12).toLong) }
    val df = rows.toDF("k", "x", "y")
    val got = Rollups.spearmanByKey(df, "k", "x", "y")
      .as[(String, Long, Double)].collect().head
    // replay: midrank pearson in the JVM
    def midranks(vs: Seq[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val below = sorted.count(_ < v)
        val c = sorted.count(_ == v)
        v -> (below + (c + 1) / 2.0)
      }.toMap
    }
    val xs = rows.map(_._2); val ys = rows.map(_._3)
    val (rx, ry) = (midranks(xs), midranks(ys))
    val (a, b) = (xs.map(rx), ys.map(ry))
    val n = a.size
    val num = n * a.zip(b).map { case (p, q) => p * q }.sum - a.sum * b.sum
    val den = math.sqrt(n * a.map(p => p * p).sum - a.sum * a.sum) *
      math.sqrt(n * b.map(q => q * q).sum - b.sum * b.sum)
    assert(got._2 == n.toLong && math.abs(got._3 - num / den) < 1e-12,
      s"got $got want rho=${num / den}")
  }

  test("spearmanByKey matches a JVM midrank-pearson replay on lineitem") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag").as("k"),
        round(col("l_quantity") * 100).cast("long").as("x"),
        round(col("l_extendedprice") * 100).cast("long").as("y"))
    val got = Rollups.spearmanByKey(li, "k", "x", "y")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    def midranks(vs: Seq[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val below = sorted.count(_ < v)
        val c = sorted.count(_ == v)
        v -> (below + (c + 1) / 2.0)
      }.toMap
    }
    for ((k, rs) <- li.as[(String, Long, Long)].collect().groupBy(_._1)) {
      val rx = midranks(rs.map(_._2).toSeq)
      val ry = midranks(rs.map(_._3).toSeq)
      val pairs = rs.map(r => (rx(r._2), ry(r._3)))
      val n = pairs.length.toDouble
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val want = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      assert(math.abs(got(k) - want) < 1e-9, s"key $k: ${got(k)} vs $want")
    }
  }

  test("benfordAudit: digits, exclusions, and dense zero rows") {
    val df = Seq(("a", 123.7), ("a", 19.2), ("a", 0.4), ("a", 950.0),
      ("b", 5.5)).toDF("k", "v")
    val got = Profiling.benfordAudit(df, "k", "v")
      .orderBy("k", "digit")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // key a: 123→1, 19→1, 950→9 (0.4 excluded): n=3
    val a = got.filter(_._1 == "a")
    assert(a.size == 9)
    assert(a.map(_._3).sum == 3L)
    assert(a.find(_._2 == 1L).get._3 == 2L)
    assert(a.find(_._2 == 9L).get._3 == 1L)
    assert(a.find(_._2 == 1L).get._4 == 666666L) // floor(2e6/3)
    assert(a.find(_._2 == 5L).get._3 == 0L)      // dense zero row
    val b = got.filter(_._1 == "b")
    assert(b.find(_._2 == 5L).get._4 == 1000000L)
    // benford expectations sum to ~1e6 and dev is |share - benford|
    assert(a.map(_._5).sum == 999995L)
    assert(a.forall(r => r._6 == math.abs(r._4 - r._5)))
  }
}
