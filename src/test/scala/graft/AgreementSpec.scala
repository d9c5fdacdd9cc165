package graft

import graft.operators.Agreement
import graft.operators.Profiling

/** Hand-checked kernels for the gate-diagnostic additions: Cohen's kappa
  * (q153) and exact midrank ROC-AUC (q154). */
class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("cohenKappa: textbook 2x2 example") {
    // a=20 both, b=5 A-only, c=10 B-only, d=15 neither: po=0.7,
    // pe = (25*30 + 25*20)/2500 = 0.5, kappa = 0.4
    val rows =
      Seq.fill(20)(("g", true, true)) ++ Seq.fill(5)(("g", true, false)) ++
      Seq.fill(10)(("g", false, true)) ++ Seq.fill(15)(("g", false, false))
    val got = Agreement.cohenKappa(rows.toDF("k", "ra", "rb"), "k", "ra", "rb")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("g", 50L, 20L, 5L, 10L, 15L, 700000L, 400000L)))
  }

  test("cohenKappa: perfect disagreement floors to -1e6; constant raters null") {
    val rows = Seq.fill(5)(("neg", true, false)) ++ Seq.fill(5)(("neg", false, true)) ++
      Seq.fill(4)(("const", true, true))
    val got = Agreement.cohenKappa(rows.toDF("k", "ra", "rb"), "k", "ra", "rb")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(7)) None else Some(r.getLong(7)))).toMap
    // po=0, pe=(5*5+5*5)/100=0.5 → kappa = -1 exactly
    assert(got("neg") == Some(-1000000L))
    // both raters constant-true: pe = 1, denominator 0 → null
    assert(got("const") == None)
  }

  test("cohenKappa: floor (not truncation) for negative non-integral kappa") {
    // a=1,b=3,c=3,d=2: n=9, po=3/9, pe=(4*4+5*5)/81=41/81
    // kappa = (27-41)/(81-41) = -14/40 = -0.35 → floor ppm = -350000
    val rows = Seq.fill(1)(("k", true, true)) ++ Seq.fill(3)(("k", true, false)) ++
      Seq.fill(3)(("k", false, true)) ++ Seq.fill(2)(("k", false, false))
    val got = Agreement.cohenKappa(rows.toDF("k", "ra", "rb"), "k", "ra", "rb")
      .select("kappa_ppm").as[Long].collect()
    assert(got.toSeq == Seq(-350000L))
    // the floor-vs-truncation discriminator: a=2,b=1,c=1,d=0: n=4,
    // po=1/2, pe=(3*3+1*1)/16 → kappa = (8-10)/(16-10) = -1/3; floor ppm
    // is -333334 (truncation would give -333333)
    val rows2 = Seq.fill(2)(("k", true, true)) ++ Seq.fill(1)(("k", true, false)) ++
      Seq.fill(1)(("k", false, true))
    val g2 = Agreement.cohenKappa(rows2.toDF("k", "ra", "rb"), "k", "ra", "rb")
      .select("kappa_ppm").as[Long].collect()
    assert(g2.toSeq == Seq(-333334L))
  }

  test("rankSumAuc: midrank ties match the hand computation") {
    // pos scores {2, 3}, neg scores {1, 2}: U1 = 3.5 → AUC = 0.875
    val rows = Seq(("s", 3L, true), ("s", 2L, true), ("s", 1L, false), ("s", 2L, false))
    val got = Profiling.rankSumAuc(rows.toDF("k", "v", "y"), "k", "v", "y")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("s", 2L, 2L, 875000L)))
  }

  test("rankSumAuc: separation, reversal, and degenerate groups") {
    val rows =
      Seq(("sep", 10L, true), ("sep", 11L, true), ("sep", 1L, false)) ++
      Seq(("rev", 1L, true), ("rev", 2L, false), ("rev", 3L, false)) ++
      Seq(("onecls", 5L, true), ("onecls", 6L, true))
    val got = Profiling.rankSumAuc(rows.toDF("k", "v", "y"), "k", "v", "y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got("sep") == Some(1000000L))   // perfect ranking
    assert(got("rev") == Some(0L))         // perfectly wrong
    assert(got("onecls") == None)          // no negatives → undefined
  }

  test("rankSumAuc equals the brute-force pair count on corpus data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import org.apache.spark.sql.functions._
    val df = docs.select(col("source"), col("n_chars").cast("long").as("v"),
      (col("lang") === "en").as("y"))
    val got = Profiling.rankSumAuc(df, "source", "v", "y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val rows = df.as[(String, Long, Boolean)].collect().groupBy(_._1)
    for ((src, rs) <- rows) {
      val pos = rs.filter(_._3).map(_._2)
      val neg = rs.filterNot(_._3).map(_._2)
      val want =
        if (pos.isEmpty || neg.isEmpty) None
        else {
          // AUC = (#concordant + #ties/2) / (n1 n0), floored to ppm
          val wins = (for (p <- pos; n <- neg)
            yield if (p > n) 2L else if (p == n) 1L else 0L).sum
          Some(wins * 1000000L / (2L * pos.length * neg.length))
        }
      assert(got(src) == want, s"source $src")
    }
  }
}
