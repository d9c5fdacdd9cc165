package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the train/test overlap check every serious
  * training-data pipeline runs before shipping a corpus: flag corpus
  * documents sharing at least `minOverlapFrac` of a test item's distinct
  * word n-grams (the standard n-gram contamination definition used for
  * eval-set leakage).
  *
  * 100 TB posture (the BM25 vocabulary-prune pattern): the test set is
  * small by construction, so its n-grams broadcast; the corpus n-gram
  * stream is generated shuffle-free (explode of an in-place projection,
  * the q49 chunking idiom) and semi-joined against the broadcast test
  * vocabulary BEFORE anything shuffles — only the tiny matching fraction
  * ever moves. The one shuffle is the per-(doc, test) match count over
  * that pruned stream. No corpus self-join, no full-corpus distinct.
  */
object Decontamination {

  /** (doc_id, test_id, matched, test_total, overlap_frac) for every pair
    * at or above `minOverlapFrac`, where `matched` counts DISTINCT shared
    * n-grams and `test_total` the test item's distinct n-grams. Documents
    * shorter than `n` tokens have no n-grams and cannot be flagged. */
  def contaminationReport(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      testSet: DataFrame,
      testIdCol: String,
      testTextCol: String,
      n: Int = 3,
      minOverlapFrac: Double = 0.5): DataFrame = {
    require(n >= 1 && minOverlapFrac > 0.0, "need n >= 1 and a positive threshold")

    def grams(df: DataFrame, id: Column, text: Column, outId: String): DataFrame = {
      val toks = split(trim(lower(text)), "\\s+")
      df.select(id.as(outId), toks.as("__t"))
        .filter(size(col("__t")) >= n)
        .select(col(outId),
          explode(sequence(lit(1), size(col("__t")) - (n - 1))).as("__p"), col("__t"))
        .select(col(outId),
          array_join(slice(col("__t"), col("__p"), lit(n)), " ").as("ngram"))
    }

    val tg = grams(testSet, col(testIdCol), col(testTextCol), "test_id").distinct()
    val totals = tg.groupBy("test_id").agg(count(lit(1)).as("test_total"))
    val vocab = tg.select("ngram").distinct()

    grams(docs, col(idCol), col(textCol), "doc_id")
      .join(broadcast(vocab), Seq("ngram"), "left_semi") // prune before any shuffle
      .distinct()                                        // distinct (doc, ngram), pruned grain
      .join(broadcast(tg), "ngram")
      .groupBy("doc_id", "test_id")
      .agg(count(lit(1)).as("matched"))
      .join(broadcast(totals), "test_id")
      .withColumn("overlap_frac", col("matched").cast("double") / col("test_total"))
      .filter(col("overlap_frac") >= minOverlapFrac)
      .select("doc_id", "test_id", "matched", "test_total", "overlap_frac")
  }
}
