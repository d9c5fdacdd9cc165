package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, IntegerType, StringType, StructField, StructType}

/** Greedy maximum-coverage selection — "which k slices of the corpus
  * account for the most affected items" (dup-affected docs per
  * source/language, contaminated docs per shard, failing rows per
  * upstream). The greedy algorithm is the canonical (1-1/e)-approximation
  * for max-coverage; with overlapping sets the answer is NOT top-k by raw
  * count, because round r must discount everything already covered.
  *
  * Scale shape: driver state is the ≤k chosen set ids (the OUTPUT — k is a
  * small constant); each round is two distributed jobs over the membership
  * table — an anti-join against the covered subset and a per-set
  * distinct-count — then a TakeOrdered(1) argmax. Nothing quadratic, no
  * per-item driver data; at 100 TB the membership table shuffles on the
  * set id, k times.
  */
object SetCover {

  /** Greedy k-round max coverage over `memb(setCol, idCol)` membership
    * rows (duplicates tolerated). Ties break to the lexicographically
    * smaller set id. Rounds after the universe is exhausted emit nothing.
    * Returns one row per executed round:
    * `(round, picked_set, newly_covered, cumulative_covered)`. */
  def greedyMaxCoverage(
      memb: DataFrame,
      setCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 64, "k must be in [1, 64] (driver-held output)")
    val spark = memb.sparkSession
    // setCol accepts any type; the output schema is StringType, so cast
    // up front (a long/int set id would otherwise CCE at pick(0).getString)
    val m = memb.select(col(setCol).cast("string").as("s"), col(idCol).as("i"))
      .distinct()

    var chosen = Vector.empty[String]
    var cumulative = 0L
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    var exhausted = false
    for (r <- 1 to k if !exhausted) {
      val coveredIds = m.filter(col("s").isin(chosen: _*)).select(col("i"))
      val uncovered = m.join(coveredIds.distinct(), Seq("i"), "left_anti")
      val pick = uncovered
        .groupBy(col("s")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("s").asc)
        .limit(1).collect()
      if (pick.isEmpty) exhausted = true
      else {
        val (set, newly) = (pick(0).getString(0), pick(0).getLong(1))
        chosen = chosen :+ set
        cumulative += newly
        rows += Row(r, set, newly, cumulative)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("round", IntegerType, nullable = false),
        StructField("picked_set", StringType, nullable = false),
        StructField("newly_covered", LongType, nullable = false),
        StructField("cumulative_covered", LongType, nullable = false))))
  }
}
