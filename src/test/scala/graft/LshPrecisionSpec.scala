package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Candidate-verify kernels: q162's exact-Jaccard verification of LSH
  * candidates and q163's quality-aware keeper arbitration. */
class LshPrecisionSpec extends SparkSpec {
  import spark.implicits._

  private def shingles(text: String): Set[String] = {
    val t = text.trim.toLowerCase.split("\\s+").toSeq
    if (t.size < 2) Set(t.mkString(" "))
    else t.sliding(2).map(_.mkString(" ")).toSet
  }

  test("q162 jaccard verification matches a JVM set replay on every candidate") {
    val dir = "/root/testdata/sf0.001"
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val got = SparkEntry.queries("q162_lsh_precision")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty, "sf0.001 must produce candidate pairs")
    for ((a, b, ni, nu, ppm, ver) <- got) {
      val (sa, sb) = (shingles(texts(a)), shingles(texts(b)))
      val i = sa.intersect(sb).size.toLong
      val u = sa.size + sb.size - i
      assert(ni == i && nu == u, s"pair ($a,$b): got ($ni,$nu) want ($i,$u)")
      assert(ppm == i * 1000000L / u && ver == (ppm >= 500000L), s"pair ($a,$b)")
    }
  }

  test("q169 calibration bins partition q162's candidate set exactly") {
    val dir = "/root/testdata/sf0.001"
    val cal = SparkEntry.queries("q169_minhash_calibration")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val pairs = SparkEntry.queries("q162_lsh_precision")(spark, dir).count()
    assert(cal.nonEmpty && cal.map(_._3).sum == pairs,
      "every candidate pair must land in exactly one estimate bin")
    for ((est, estPpm, n, avgTrue) <- cal) {
      assert(est >= 0L && est <= 32L && n > 0L)
      assert(estPpm == est * 1000000L / 32L)
      assert(avgTrue >= 0L && avgTrue <= 1000000L)
    }
    // signature agreement is a Jaccard estimator: bin means should rise
    // with the estimate (weak monotonicity over the observed bins)
    val sorted = cal.sortBy(_._1)
    assert(sorted.last._4 >= sorted.head._4,
      s"top bin should not score below the bottom bin: $sorted")
  }

  test("q163 keeper is the max-token (then min-id) member of each component") {
    val dir = "/root/testdata/sf0.001"
    val comp = Dedup.connectedComponents(
      Dedup.minhashCandidatePairs(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        shingleSize = 2, numHashes = 32, rowsPerBand = 8, portable = true))
      .as[(Long, Long)].collect() // (id, component)
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    val got = SparkEntry.queries("q163_quality_keeper")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val byComp = comp.groupBy(_._2)
    assert(got.length == byComp.size)
    for ((c, nd, keeper, ktoks, total, saved) <- got) {
      val members = byComp(c).map(_._1)
      val want = members.minBy(id => (-toks(id), id))
      assert(keeper == want && nd == members.length, s"component $c")
      assert(ktoks == toks(want) && total == members.map(toks).sum &&
        saved == total - ktoks, s"component $c")
    }
  }
}
