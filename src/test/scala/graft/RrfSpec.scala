package graft

import graft.operators.TextSearch
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion: overlap boost, single-list passthrough, exact
  * arithmetic. */
class RrfSpec extends SparkSpec {
  import spark.implicits._

  private def list(rows: (Int, Long, Int)*) =
    rows.toSeq.toDF("query_id", "doc_id", "rank")

  test("docs on both lists outrank single-list docs of equal rank") {
    val a = list((1, 10L, 1), (1, 11L, 2), (1, 12L, 3))
    val b = list((1, 11L, 1), (1, 13L, 2))
    val got = TextSearch.rrfFuse(a, b, k0 = 60, k = 10)
      .orderBy("rank").as[(Int, Long, Long, Double)].collect()
    // doc 11: 1/62 + 1/61 beats doc 10's 1/61 and doc 13's 1/62
    assert(got.head._3 == 11L)
    assert(got.head._4 == 1.0 / 62 + 1.0 / 61)
    assert(got.map(_._3).toSeq == Seq(11L, 10L, 13L, 12L))
  }

  test("a doc absent from one list scores exactly its single-list term") {
    val a = list((1, 10L, 1))
    val b = list((1, 20L, 1))
    val got = TextSearch.rrfFuse(a, b, k0 = 60, k = 10)
      .select("doc_id", "rrf_score").as[(Long, Double)].collect().toMap
    assert(got(10L) == 1.0 / 61 && got(20L) == 1.0 / 61)
  }

  test("equal scores tie-break by doc_id; k caps per query independently") {
    val a = list((1, 5L, 1), (1, 3L, 2), (2, 7L, 1))
    val b = list((1, 3L, 1), (1, 5L, 2), (2, 8L, 1))
    val got = TextSearch.rrfFuse(a, b, k0 = 60, k = 1)
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    // query 1: docs 3 and 5 both score 1/61 + 1/62 -> doc 3 wins on id
    assert(got.map(r => (r._1, r._3)).toSeq == Seq((1, 3L), (2, 7L)))
  }
}
