package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Round-9 wave: JL signed projection (q232), brand-partition modularity
  * (q230), split near-dup leakage (q231) — each checked against an
  * independent driver-side brute-force recomputation. */
class ProjectionGraphSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------ JL (q232)

  test("jlSigns is deterministic, ±1, rectangular") {
    val a = Similarity.jlSigns(16, 64)
    val b = Similarity.jlSigns(16, 64)
    assert(a == b)
    assert(a.length == 16 && a.forall(_.length == 64))
    assert(a.flatten.forall(s => s == 1 || s == -1))
    // not degenerate: both signs occur in every row
    assert(a.forall(row => row.contains(1) && row.contains(-1)))
  }

  test("signedProjection equals the driver-side integer matmul") {
    val signs = Similarity.jlSigns(8, 64)
    val q = Similarity.quantizeInt8(
      Tables.embeddings(spark, sf).filter(col("vec_id") < 20),
      "vec_id", "embedding")
    val got = Similarity.signedProjection(q, "vec_id", "qvec", signs)
      .orderBy("vec_id")
      .as[(Long, Seq[Double])].collect()
    val raw = q.orderBy("vec_id").select(col("vec_id"), col("qvec"))
      .as[(Long, Seq[Byte])].collect()
    assert(got.length == raw.length && got.nonEmpty)
    got.zip(raw).foreach { case ((idG, proj), (idR, qv)) =>
      assert(idG == idR)
      val exp = signs.map(row =>
        row.zip(qv).map { case (s, x) => s.toLong * x.toLong }.sum.toDouble)
      assert(proj == exp, s"vec $idG: $proj vs $exp")
    }
  }

  test("q232: every (probe, dim) reports, overlap bounded by k, exact ratio") {
    val rows = SparkEntry.queries("q232_jl_recall")(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
    val nProbes = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 10).count()
    assert(rows.length == 3 * nProbes)
    assert(rows.forall { case (_, d, n, r) =>
      Seq(8, 16, 32).contains(d) && n >= 0 && n <= 5 && r == n / 5.0 })
  }

  // ---------------------------------------------------- modularity (q230)

  test("q230: per-brand rows sum to the brute-force Newman–Girvan Q") {
    val rows = SparkEntry.queries("q230_modularity")(spark, sf)
      .select("brand", "n_nodes", "degree_sum", "within_edges", "m_edges",
        "contrib_ppm", "contrib")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val m = rows.head._5
    assert(rows.forall(_._5 == m))

    // independent recomputation: harvest the same edge list, then apply
    // the definition Q = Σ_c [e_c/m − (D_c/2m)²] from scratch
    val op = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = op.toDF("o", "pa").join(op.toDF("o", "pb"), "o")
      .where(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("c"))
      .where(col("c") >= 2)
      .select("pa", "pb").as[(Long, Long)].collect()
    val brandOf = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand")).as[(Long, String)]
      .collect().toMap
    assert(edges.length.toLong == m)
    val within = edges.groupBy { case (a, b) => brandOf(a) }
      .view.mapValues(_.count { case (a, b) => brandOf(a) == brandOf(b) })
    val deg = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.length.toLong)
    val degByBrand = deg.toSeq.groupBy { case (n, _) => brandOf(n) }
      .view.mapValues(_.map(_._2).sum)
    rows.foreach { case (brand, nNodes, dSum, wEdges, _, ppm, contrib) =>
      assert(dSum == degByBrand(brand))
      assert(nNodes == deg.count { case (n, _) => brandOf(n) == brand })
      assert(wEdges == within.getOrElse(brand, 0).toLong)
      val expContrib = wEdges.toDouble / m -
        math.pow(dSum.toDouble / (2.0 * m), 2)
      assert(math.abs(contrib - expContrib) < 1e-12)
      val expPpm = wEdges * 1000000L / m -
        (BigInt(dSum) * dSum * 1000000 / (BigInt(m) * m * 4)).toLong
      assert(ppm == expPpm)
    }
    val bruteQ = rows.map(_._7).sum
    // global sanity: Q within the mathematical range
    assert(bruteQ >= -1.0 && bruteQ <= 1.0)
  }

  // ------------------------------------------------------- leakage (q231)

  /** Driver-side replica of PortableHash.md5Hash60 on a long id. */
  private def md5h60(v: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(v.toString.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(1, 16), 16)
  }

  test("q231 counts match a brute-force relabeling of the q18 pairs") {
    val row = SparkEntry.queries("q231_split_leakage")(spark, sf)
      .select("n_pairs", "n_train_train", "n_held_held", "n_cross",
        "n_held_docs_leaked", "n_held_docs", "leak_ppm", "exposure_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    val pairs = Dedup.minhashCandidatePairs(
      Tables.documents(spark, sf), "doc_id", "text",
      shingleSize = 2, numHashes = 32, rowsPerBand = 8, portable = true)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    def train(id: Long): Boolean = md5h60(id) % 1000000L < 900000L
    val nPairs = pairs.length.toLong
    val cross = pairs.filter { case (a, b) => train(a) != train(b) }
    val nTT = pairs.count { case (a, b) => train(a) && train(b) }.toLong
    val nHH = pairs.count { case (a, b) => !train(a) && !train(b) }.toLong
    val leakedHeld = cross.map { case (a, b) => if (train(a)) b else a }
      .distinct.length.toLong
    val nHeld = Tables.documents(spark, sf).select("doc_id").as[Long]
      .collect().count(id => !train(id)).toLong
    assert(row._1 == nPairs && row._2 == nTT && row._3 == nHH
      && row._4 == cross.length.toLong)
    assert(row._5 == leakedHeld && row._6 == nHeld)
    assert(row._7 == (if (nPairs > 0) cross.length * 1000000L / nPairs else 0L))
    assert(row._8 == (if (nHeld > 0) leakedHeld * 1000000L / nHeld else 0L))
  }
}
