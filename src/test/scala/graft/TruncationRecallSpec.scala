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

  test("PQ-ADC: lossless codebook on unit vectors recovers the exact top-k") {
    // corpus == codebook: every vector quantizes to itself with all-zero
    // sub-distances, so ADC distance IS the exact squared L2 — and on
    // unit-norm vectors ||a-b||^2 = 2 - 2cos, so the L2-ascending PQ rank
    // equals the cosine-descending exact rank (ties break by id on both
    // sides) -> recall must be exactly 1.0 for every probe
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 16).map { i =>
      val raw = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(x => (x / n).toFloat).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.pqAdcRecall(
      df, df.filter(col("vec_id") < 10), df,
      "vec_id", "embedding", m = 8, dim = 64, codebookSize = 16, k = 3)
      .orderBy("query_id")
      .as[(Long, Long, Double)].collect()
    assert(got.length == 10)
    assert(got.forall { case (_, n, r) => n == 3L && r == 1.0 },
      got.mkString(", "))
  }

  test("PQ-ADC on the real table: every probe reports, overlap bounded by k") {
    val got = Similarity.pqAdcRecall(
      emb, probes, emb.filter(col("vec_id") < 16), "vec_id", "embedding",
      m = 8, dim = 64, codebookSize = 16, k = 5)
      .as[(Long, Long, Double)].collect()
    assert(got.length == 5)
    assert(got.forall { case (_, n, r) => n >= 0 && n <= 5 && r == n / 5.0 })
  }

  test("IVF-PQ with nprobe = nlist degenerates to the full ADC scan") {
    val probes5 = emb.filter(col("vec_id") < 5)
    val cents = Similarity.headCentroids(emb, "vec_id", "embedding", 16)
    val full = Similarity.pqAdcRecall(
      emb, probes5, emb.filter(col("vec_id") < 16), "vec_id", "embedding",
      m = 8, dim = 64, codebookSize = 16, k = 5)
      .orderBy("query_id").as[(Long, Long, Double)].collect().toSeq
    val ivfAll = Similarity.ivfPqRecall(
      emb, probes5, cents, emb.filter(col("vec_id") < 16),
      "vec_id", "embedding",
      m = 8, dim = 64, codebookSize = 16, nprobe = 16, k = 5)
      .orderBy("query_id").as[(Long, Long, Double)].collect().toSeq
    assert(ivfAll == full, s"nprobe=nlist must scan everything: $ivfAll vs $full")
    // and a 4-cell probe reports for every query with overlap bounded by k
    val ivf4 = Similarity.ivfPqRecall(
      emb, probes5, cents, emb.filter(col("vec_id") < 16),
      "vec_id", "embedding",
      m = 8, dim = 64, codebookSize = 16, nprobe = 4, k = 5)
      .as[(Long, Long, Double)].collect()
    assert(ivf4.length == 5)
    assert(ivf4.forall { case (_, n, r) => n >= 0 && n <= 5 && r == n / 5.0 })
  }

  test("mutualTopK: one-directional neighbors are filtered out (hub case)") {
    // two tight pairs + an outlier: at k=1 each pair is mutually nearest
    // (2 edges); the outlier's nearest is a pair member whose own nearest
    // is its partner -> no edge for the outlier
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat) ++ Seq.fill(62)(0f)
    val df = Seq(
      (0L, v(1.0, 0.00)), (1L, v(1.0, 0.01)),
      (2L, v(0.0, 1.00)), (3L, v(0.01, 1.0)),
      (4L, v(0.7, 0.75))
    ).toDF("vec_id", "embedding")
    val got = Similarity.mutualTopK(df, "vec_id", "embedding", k = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L), (2L, 3L)))
  }

  test("mutualTopK edges are exactly the reciprocal subset of the kNN lists") {
    val edges = Similarity.mutualTopK(emb, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Long, Long)].collect()
    val top = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 3)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long"))
      .as[(Long, Long, Long)].collect()
      .map { case (q, n, r) => (q, n) -> r }.toMap
    assert(edges.nonEmpty)
    edges.foreach { case (a, b, rab, rba) =>
      assert(a < b && top.get((a, b)).contains(rab) && top.get((b, a)).contains(rba))
    }
    // completeness: every reciprocal pair in the lists appears as an edge
    val expected = top.keySet.filter { case (q, n) => q < n && top.contains((n, q)) }
    assert(edges.map(e => (e._1, e._2)).toSet == expected)
  }

  test("mutualTopKIvf with one bucket reproduces the exact mutualTopK") {
    // nlist=1, nprobe=1: every vector lands in bucket 0 and probes bucket 0,
    // so the candidate set is all pairs — the IVF plan must equal the exact
    // formulation row-for-row (same ranks, same edges)
    val cents1 = Similarity.headCentroids(emb, "vec_id", "embedding", 1)
    val ivf = Similarity.mutualTopKIvf(emb, "vec_id", "embedding", k = 3,
      centroids = cents1, nprobe = 1)
      .as[(Long, Long, Long, Long)].collect().toSet
    val exact = Similarity.mutualTopK(emb, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(ivf == exact)
  }

  test("mutualTopKIvf edges are reciprocal and candidate-consistent") {
    // bucketed run: every edge must (a) be ordered, (b) carry ranks in
    // 1..k, (c) connect vectors that can actually see each other — each
    // endpoint's bucket is in the other's probe list
    val cents = Similarity.headCentroids(emb, "vec_id", "embedding", 4)
    val edges = Similarity.mutualTopKIvf(emb, "vec_id", "embedding", k = 3,
      centroids = cents, nprobe = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(edges.nonEmpty)
    assert(edges.forall { case (a, b, rab, rba) =>
      a < b && rab >= 1 && rab <= 3 && rba >= 1 && rba <= 3 })
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
