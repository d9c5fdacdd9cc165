package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Length-bucketed batch assignment — the training-prep step that sorts
  * documents by length and deals them into fixed-size batches so each
  * batch pads to ITS OWN maximum, not the corpus maximum (the standard
  * padding-waste minimization before packing/collation).
  *
  * The global rank by (length desc, id) is computed WITHOUT a
  * single-partition window over the corpus (the q12 pagination hazard):
  *  1. histogram the DISTINCT lengths (one map-side-combined shuffle to a
  *     tiny table — lengths are bounded by the longest document);
  *  2. cumulative offsets over that tiny table (the only unpartitioned
  *     window, sized #distinct-lengths, not #docs);
  *  3. broadcast the offsets back and rank WITHIN each length partition —
  *     distributed, bounded by the largest same-length cohort.
  * rank = offset(len) + intra-length rank; exact, deterministic, and every
  * corpus-sized stage is hash-partitioned. This is the same
  * distinct-value-grain move as Profiling's median selection.
  */
object Batching {

  /** Adds `(rank, batch)` to `docs`: rank = 1-based position in (lenCol
    * desc, idCol asc) order, batch = (rank-1) / batchSize in exact integer
    * arithmetic. */
  def lengthBatches(
      docs: DataFrame,
      idCol: String,
      lenCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val counts = docs.groupBy(col(lenCol).cast("long").as("__len"))
      .agg(count(lit(1)).as("__n"))
    val offsets = counts.withColumn("__off",
      coalesce(
        sum(col("__n")).over(Window.orderBy(col("__len").desc)) - col("__n"),
        lit(0L)))
    val intra = Window.partitionBy(col(lenCol)).orderBy(col(idCol))
    val ranked = docs
      .join(broadcast(offsets.select(col("__len"), col("__off"))),
        col(lenCol).cast("long") === col("__len"))
      .withColumn("rank", (col("__off") + row_number().over(intra)).cast("long"))
      .drop("__len", "__off")
    // exact integer floor division (the q71 pattern): (a - a mod b) / b is
    // an exact integer-valued double
    val a = col("rank") - 1
    ranked.withColumn("batch",
      ((a - pmod(a, lit(batchSize.toLong))) / batchSize).cast("long"))
  }
}
