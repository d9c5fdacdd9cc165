package graft

import graft.operators.{Encoding, Scoring}
import org.apache.spark.sql.functions._

/** In-engine model scoring + leakage-safe encoding. */
class ScoringSpec extends SparkSpec {
  import spark.implicits._

  test("TreeEnsemble: both faces agree row-for-row (SQL face is ANSI)") {
    val ens = Scoring.TreeEnsemble(Seq(
      Scoring.Split("x", 1.5, Scoring.Leaf(-1.0), Scoring.Leaf(2.0)),
      Scoring.Split("y", 0.0,
        Scoring.Split("x", 3.0, Scoring.Leaf(0.25), Scoring.Leaf(0.5)),
        Scoring.Leaf(-0.125))))
    val df = Seq((1L, 1.0, -1.0), (2L, 2.0, -1.0), (3L, 2.0, 1.0),
      (4L, 4.0, -0.5)).toDF("id", "x", "y")
    df.createOrReplaceTempView("pts")
    val viaColumn = df.select(col("id"),
      ens.column(Map("x" -> col("x"), "y" -> col("y"))).as("m"))
      .as[(Long, Double)].collect().toMap
    val viaSql = spark.sql(
      s"SELECT id, ${ens.sql(Map("x" -> "x", "y" -> "y"))} AS m FROM pts")
      .as[(Long, Double)].collect().toMap
    assert(viaColumn == viaSql)
    // hand check one row: x=1.0,y=-1.0 -> tree1 left (-1.0), tree2: y<0 ->
    // x<3 -> 0.25; margin -0.75
    assert(viaColumn(1L) == -0.75)
  }

  test("hashedLinearMargin: exact fixed-point margins, token sensitivity") {
    val units = Seq.tabulate(8)(i => (i + 1).toLong * 100L)
    val df = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "alpha gamma"))
      .toDF("id", "text")
    val got = df.select(col("id"),
      Scoring.hashedLinearMargin(col("text"), units, biasUnits = 0L,
        unitsPerOne = 1000.0).as("m"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == got(2L), "same text, same margin")
    assert(got(1L) != got(3L), "different token, different margin")
    // every margin is an exact multiple of 0.1 (100-unit weights / 1000)
    got.values.foreach(m => assert((m * 10).isWhole, s"non-exact margin $m"))
  }

  test("looTargetEncoding: self-label excluded; singleton is null") {
    val df = Seq(
      ("A", true), ("A", false), ("A", true),
      ("B", true)
    ).toDF("cat", "y")
    val got = Encoding.looTargetEncoding(df, "cat", "y", alpha = 1.0, out = "enc")
      .select("cat", "y", "enc")
      .as[(String, Boolean, Option[Double])].collect()
    // A: pos=2, n=3 -> y=true: (2-1+1)/(2+2)=0.5 ; y=false: (2-0+1)/4=0.75
    got.filter(_._1 == "A").foreach {
      case (_, true, e) => assert(e.contains(0.5))
      case (_, false, e) => assert(e.contains(0.75))
    }
    assert(got.filter(_._1 == "B").forall(_._3.isEmpty))
  }
}
