package graft

import graft.operators.{Dedup, SetSimilarity}
import org.apache.spark.sql.functions._

/** Prefix-filtered exact set-similarity join: completeness vs brute force. */
class SetSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "the quick brown fox leaps over the lazy dog"),
    (4L, "entirely different content about spark engines"),
    (5L, "entirely different content about spark engines"), // exact dup of 4
    (6L, "short"), // shorter than the shingle size
    (7L, "short"),
    (8L, "one two three four five six seven eight nine ten"),
    (9L, "pad one two three four five six seven eight nine ten")
  ).toDF("doc_id", "text")

  private def brute(threshold: Double): Set[(Long, Long)] = {
    val ids = docs.select(col("doc_id")).as[Long].collect().sorted
    val pairs = ids.combinations(2).map(p => (p(0), p(1))).toSeq
      .toDF("id_a", "id_b")
    Dedup.verifyJaccard(docs, pairs, "doc_id", "text", shingleSize = 3)
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
  }

  test("self-join matches the brute-force pair set at several thresholds") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val got = SetSimilarity.selfJoin(docs, "doc_id", "text", t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == brute(t), s"threshold $t")
    }
  }

  test("exact duplicates pair at jaccard 1.0, including sub-shingle docs") {
    val got = SetSimilarity.selfJoin(docs, "doc_id", "text", 1.0)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(got == Set((4L, 5L, 1.0), (6L, 7L, 1.0)))
  }

  test("jaccard values are the exact integer ratios") {
    // docs 8 and 9: 8 shingles vs 9 shingles, 8 shared -> 8/9
    val j = SetSimilarity.selfJoin(docs, "doc_id", "text", 0.5)
      .where(col("id_a") === 8L && col("id_b") === 9L)
      .select("jaccard").as[Double].collect()
    assert(j.toSeq == Seq(8.0 / 9.0))
  }

  test("reserved internal columns are rejected") {
    intercept[IllegalArgumentException] {
      SetSimilarity.selfJoin(docs.withColumn("__n", lit(1)),
        "doc_id", "text", 0.5)
    }
  }
}
