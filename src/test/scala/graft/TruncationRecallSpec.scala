package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Truncation-recall ablation invariants on the real embedding table. */
class TruncationRecallSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val probes = emb.filter(col("vec_id") < 5)

  test("truncating to the full dimension is a perfect recall of 1.0") {
    val dim = emb.select(size(col("embedding"))).as[Int].head()
    val got = Similarity.truncationRecall(emb, probes, "vec_id", "embedding",
      dims = Seq(dim), k = 5)
      .select("recall").as[Double].collect()
    assert(got.length == 5 && got.forall(_ == 1.0))
  }

  test("every (probe, dim) reports, overlap bounded by k") {
    val got = Similarity.truncationRecall(emb, probes, "vec_id", "embedding",
      dims = Seq(4, 16), k = 5)
      .as[(Long, Int, Long, Double)].collect()
    assert(got.length == 10) // 5 probes x 2 dims, zero-overlap rows included
    assert(got.forall { case (_, _, n, r) =>
      n >= 0 && n <= 5 && r == n / 5.0 })
  }
}
