package graft

import graft.functions.TextScrub
import graft.operators.{Decontamination, Dedup}
import org.apache.spark.sql.functions._

/** Round-5 pipeline operators: benchmark decontamination, incremental
  * dedup against a signature store, PII scrubbing. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("contamination report: containment=1.0, half overlap at threshold, disjoint dropped") {
    val test = Seq((100L, "w1 w2 w3 w4 w5 w6")).toDF("test_id", "text")
    val corpus = Seq(
      (1L, "prefix tokens then w1 w2 w3 w4 w5 w6 and a suffix"), // contains all 4 trigrams
      (2L, "w1 w2 w3 w4 x y z"),                                 // shares 2 of 4 = 0.5
      (3L, "completely different words here"),                   // 0
      (4L, "w2 w3")                                              // shorter than n: no grams
    ).toDF("doc_id", "text")
    val got = Decontamination.contaminationReport(
      corpus, "doc_id", "text", test, "test_id", "text", n = 3, minOverlapFrac = 0.5)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._3, r._5)).toSeq == Seq((1L, 4L, 1.0), (2L, 2L, 0.5)))
    // duplicated n-grams in a doc count once (distinct matched)
    val dup = Seq((9L, "w1 w2 w3 w1 w2 w3 w1 w2 w3")).toDF("doc_id", "text")
    val g2 = Decontamination.contaminationReport(
      dup, "doc_id", "text", test, "test_id", "text", n = 3, minOverlapFrac = 0.1)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(g2.length == 1 && g2(0)._3 == 1L) // only 'w1 w2 w3' matches, once
  }

  test("incremental minhash pairs == batch(all) minus batch(store)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val isBatch = col("doc_id") % 10 === 0
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashCandidatePairs(df, "doc_id", "text",
        shingleSize = 2, numHashes = 32, rowsPerBand = 8, portable = true)
        .as[(Long, Long, Double)].collect().toSet
    def band(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashBandTable(df, "doc_id", "text",
        shingleSize = 2, numHashes = 32, rowsPerBand = 8, portable = true)
    val all = pairsOf(docs)
    val storeOnly = pairsOf(docs.filter(!isBatch))
    val inc = Dedup.minhashIncrementalPairs(
      band(docs.filter(isBatch)), band(docs.filter(!isBatch)))
      .as[(Long, Long, Double)].collect().toSet
    assert(inc == (all -- storeOnly), s"inc=${inc.size} all=${all.size} store=${storeOnly.size}")
    assert(inc.nonEmpty, "testdata should produce at least one new-sided pair")
  }

  test("incremental probe reads only touched buckets (broadcast semi-join, no store-wide harvest)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def band(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashBandTable(df, "doc_id", "text",
        shingleSize = 2, numHashes = 32, rowsPerBand = 8, portable = true)
    val p = Dedup.minhashIncrementalPairs(
      band(docs.filter(col("doc_id") % 10 === 0)),
      band(docs.filter(col("doc_id") % 10 =!= 0)))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "touched-bucket prune must be a broadcast semi-join:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p.take(2000))
  }

  test("pii scrub: detection counts, redaction, untouched text") {
    val rows = Seq(
      (1L, "mail a.b+c@x-y.co then call 555-1234 from 10.0.200.9 done"),
      (2L, "two mails p@q.io r@s.net and ips 1.2.3.4 5.6.7.8"),
      (3L, "nothing sensitive here 555-12 and 1.2.3 stay")
    ).toDF("id", "t")
    val got = rows.select(col("id"),
      TextScrub.emailCount(col("t")).as("e"),
      TextScrub.phoneCount(col("t")).as("p"),
      TextScrub.ipv4Count(col("t")).as("i"),
      TextScrub.scrub(col("t")).as("s"))
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 1, 1, 1, "mail <EMAIL> then call <PHONE> from <IP> done")))
    assert(got(1) == ((2L, 2, 0, 2, "two mails <EMAIL> <EMAIL> and ips <IP> <IP>")))
    assert(got(2) == ((3L, 0, 0, 0, "nothing sensitive here 555-12 and 1.2.3 stay")))
  }
}
