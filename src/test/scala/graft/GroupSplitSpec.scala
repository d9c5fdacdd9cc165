package graft

import graft.operators.Splits
import org.apache.spark.sql.functions._

/** Group-aware split: zero leakage across splits, drift reported exactly. */
class GroupSplitSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 200L)
    .map(i => (i, s"dom${i % 13}", s"text $i"))
    .toDF("doc_id", "source", "text")
  private val shares = Seq(("train", 800000L), ("val", 100000L), ("test", 100000L))

  test("no group ever spans two splits") {
    val assigned = Splits.hashSplit(docs, "source", shares)
    val spanning = assigned.groupBy("source")
      .agg(countDistinct(col("split")).as("k"))
      .where(col("k") > 1)
    assert(spanning.count() == 0)
  }

  test("audit accounts for every row and group, ppm floors to the total") {
    val audit = Splits.groupSplitAudit(docs, "source", shares)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(audit.map(_._2).sum == 13)   // all 13 domains assigned once
    assert(audit.map(_._3).sum == 200)  // all rows accounted
    for ((_, _, rows, _, ppm) <- audit)
      assert(ppm == rows * Splits.Ppm / 200) // exact integer floor
  }

  test("assignment is stable under corpus growth") {
    val grown = (1L to 400L).map(i => (i, s"dom${i % 13}", s"t$i"))
      .toDF("doc_id", "source", "text")
    val before = Splits.hashSplit(docs, "source", shares)
      .select("source", "split").distinct().as[(String, String)].collect().toMap
    val after = Splits.hashSplit(grown, "source", shares)
      .select("source", "split").distinct().as[(String, String)].collect().toMap
    assert(before.forall { case (g, s) => after(g) == s })
  }
}
