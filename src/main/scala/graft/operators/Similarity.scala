package graft.operators

import graft.functions.{SimilarityFunctions => S}
import graft.plans.GraftExtensions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — query set broadcast against the
  * corpus, ranked per query with a window. This is the exact answer and the
  * right plan whenever |queries| is small (the broadcast side) regardless of
  * corpus size: the corpus is scanned once, no shuffle of corpus vectors,
  * and only |queries| × k rows survive the rank filter.
  *
  * Scale path: IVF-style coarse quantization — assign every corpus vector to
  * its nearest of `nlist` centroid buckets once (write-time), probe only
  * `nprobe` buckets per query. Here centroids are derived deterministically
  * from sampled corpus vectors (no external KMeans dependency), which keeps
  * the plumbing (bucketing, probe-join, rank) identical to a trained index.
  */
object Similarity {

  /** Exact brute-force cosine top-k neighbors for each query vector.
    * Output: (query_id, neighbor_id, cos, rank), rank 1..k, self excluded.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        GraftExtensions.cosine(corpus.sparkSession, col("qvec"), col("cvec")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-bucketed approximate top-k: corpus assigned to nearest of `nlist`
    * deterministic centroids (first `nlist` corpus vectors by id — stand-in
    * for trained centroids; plumbing identical), queries probe the `nprobe`
    * nearest centroid buckets only.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    // cent_id = position in id order — row_number, NOT
    // monotonically_increasing_id (which depends on physical partitioning and
    // would make bucket tie-breaks nondeterministic across plans)
    val cents = broadcast(
      corpus.orderBy(col(idCol)).limit(nlist)
        .select((row_number().over(Window.orderBy(col(idCol))) - 1).as("cent_id"),
          col(vecCol).as("cent")))

    def nearestBuckets(df: DataFrame, id: String, out: String, n: Int): DataFrame = {
      val w = Window.partitionBy(col(id)).orderBy(col("__cos").desc, col("cent_id"))
      df.join(cents)
        .withColumn("__cos", GraftExtensions.cosine(corpus.sparkSession, col(vecCol), col("cent")))
        .withColumn("__r", row_number().over(w))
        .filter(col("__r") <= n)
        .select(col(id), col(vecCol), col("cent_id").as(out))
    }

    val bucketedCorpus = nearestBuckets(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol)), "neighbor_id", "bucket", 1)
    val probes = nearestBuckets(
      queries.select(col(idCol).as("query_id"), col(vecCol)), "query_id", "bucket", nprobe)
      .select(col("query_id"), col(vecCol).as("qvec"), col("bucket"))

    val scored = bucketedCorpus.join(broadcast(probes), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        GraftExtensions.cosine(corpus.sparkSession, col("qvec"), col(vecCol)).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
