package graft

import graft.operators.Winnowing
import org.apache.spark.sql.functions._

/** Robust-winnowing kernels (q151/q152): bit-for-bit JVM replay of the
  * rightmost-min selection, the winnowing guarantee, and the 2/(w+1)
  * density expectation. */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def md5h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(1, 16), 16)
  }

  /** Reference implementation straight from Schleimer et al. §4: slide a
    * w-window over the gram hashes, keep the min, ties → rightmost. */
  private def winnowJvm(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    if (toks.size < k) return Set.empty
    val hs = (0 to toks.size - k)
      .map(i => md5h60(toks.slice(i, i + k).mkString(" ")))
    val starts = if (hs.size < w) Seq(0) else 0 to hs.size - w
    starts.map { j =>
      val win = hs.slice(j, math.min(j + w, hs.size))
      val m = win.min
      val pos = j + win.lastIndexOf(m) // rightmost min in the window
      ((pos + 1).toLong, m)            // 1-based positions in the operator
    }.toSet
  }

  test("fingerprints matches the JVM replay on real corpus docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 40)
    val got = Winnowing.fingerprints(docs, "doc_id", "text", k = 4, w = 4)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    assert(texts.nonEmpty)
    for ((id, text) <- texts) {
      val want = winnowJvm(text, 4, 4)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id")
    }
  }

  test("winnowing guarantee: a shared k+w-1 token run yields a shared hash") {
    // two docs agreeing on exactly a 7-token run (k=4, w=4)
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"one two three $shared nine ten eleven twelve"),
      (2L, s"uno dos $shared tres cuatro cinco seis siete")).toDF("doc_id", "text")
    val fp = Winnowing.fingerprints(docs, "doc_id", "text", k = 4, w = 4)
    val byDoc = fp.select("id", "fp_hash").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      s"guarantee violated: ${byDoc(1L)} vs ${byDoc(2L)}")
    // and the pair surfaces in the candidate screen at minShared = 1
    val pairs = Winnowing.dupCandidates(docs, "doc_id", "text", 4, 4, minShared = 1)
      .as[(Long, Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L), pairs.mkString(","))
  }

  test("density sits near the 2/(w+1) expectation on corpus text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = Winnowing.densityByGroup(docs, "doc_id", "source", "text", 4, 4)
      .select("density_ppm").as[Long].collect()
    assert(rows.nonEmpty)
    // E[density] = 2/(w+1) = 400000 ppm for random hashes; wide band —
    // the point is the sampling happened (not 1e6) and isn't degenerate
    assert(rows.forall(d => d > 150000L && d < 750000L), rows.mkString(","))
  }

  test("containment ppm uses the smaller fingerprint set") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    ).toDF("doc_id", "text")
    val fp = Winnowing.fingerprints(docs, "doc_id", "text", 4, 4)
      .select("id", "fp_hash").distinct()
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.size).toMap
    val shared = Winnowing.dupCandidates(docs, "doc_id", "text", 4, 4, 1)
      .as[(Long, Long, Long, Long)].collect()
    for ((_, _, n, ppm) <- shared)
      assert(ppm == n * 1000000L / math.min(fp(1L), fp(2L)))
  }
}
