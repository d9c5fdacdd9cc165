package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe categorical feature encoding — smoothed target (mean)
  * encoding with the LEAVE-ONE-OUT correction (Micci-Barreca, SIGKDD
  * Explorations 2001 popularized the smoothed form; LOO is the standard
  * fix for the self-leak): a category's encoding for row i excludes row
  * i's own label, otherwise the feature memorizes the target and
  * validation metrics lie.
  *
  *   enc_i = (pos(cat) − y_i + α) / (n(cat) − 1 + 2α)
  *
  * α is Laplace smoothing (rare categories shrink toward 1/2 rather than
  * exploding to 0/1). Exact arithmetic: pos/n are integer counts, the
  * numerator/denominator are exact doubles (integer-valued ± α), one
  * division — any engine replays it bit-for-bit.
  *
  * Scale shape: one map-side-combined aggregate at the category grain,
  * broadcast back over the fact rows — the fact table is never shuffled.
  * Singleton categories (n = 1) get null (no out-of-row evidence exists;
  * surfacing null beats inventing a prior silently).
  */
object Encoding {

  /** Returns `df` plus `<out>` — the LOO smoothed target encoding of
    * `catCol` against boolean `labelCol`. */
  def looTargetEncoding(
      df: DataFrame,
      catCol: String,
      labelCol: String,
      alpha: Double,
      out: String): DataFrame = {
    val stats = df.groupBy(col(catCol))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("__pos"))
    val y = when(col(labelCol), 1L).otherwise(0L)
    df.join(broadcast(stats), Seq(catCol))
      .withColumn(out,
        when(col("__n") > 1L,
          ((col("__pos") - y).cast("double") + lit(alpha)) /
            ((col("__n") - 1L).cast("double") + lit(2.0 * alpha)))
          .otherwise(lit(null).cast("double")))
      .drop("__n", "__pos")
  }
}
