package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable Misra-Gries frequency sketch (Misra & Gries 1982; mergeability
  * per Agarwal et al., "Mergeable Summaries", PODS 2012): the aggregation
  * buffer holds AT MOST k counters at every moment — map side, merge side —
  * so sketching an arbitrarily large item stream costs O(k) memory per
  * task, the bounded-buffer contract [[graft.functions.BoundedTopKStrings]]
  * set for this repo.
  *
  * Guarantee: after summarizing n items, every item with true count
  * > n/(k+1) is present among the counters, and each counter undercounts
  * its item by at most n/(k+1). Both survive arbitrary merge trees, so
  * Spark's nondeterministic partition/merge order can change WHICH extra
  * (non-heavy) items appear but can never drop a true heavy hitter — the
  * deterministic answer is recovered by [[HeavyHitters.exactHeavyHitters]]'s
  * exact second pass.
  */
case class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b
    else b.get(a) match {
      case Some(c)            => b.updated(a, c + 1L)
      case None if b.size < k => b.updated(a, 1L)
      // full and unseen: the classic all-decrement step (one shared
      // decrement absorbs the new item); O(k) only on this path
      case None => b.collect { case (t, c) if c > 1L => t -> (c - 1L) }
    }

  override def merge(
      x: Map[String, Long],
      y: Map[String, Long]): Map[String, Long] = {
    val summed = y.foldLeft(x) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest counter from all, drop the non-
      // positive — the Mergeable Summaries merge; at most k survive
      val cut = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      summed.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

/** Two-pass exact heavy hitters — the bounded-memory way to ask "which
  * items exceed 1/(k+1) of a 100 TB stream" without a full-domain
  * aggregation holding every distinct item:
  *
  * pass 1: one [[MisraGries]] sketch over the stream (O(k) buffers, one
  *         partial-aggregated collapse to a single row);
  * pass 2: exact recount restricted to the ≤ k sketch candidates (the
  *         candidate list is broadcast, so the only shuffle carries
  *         partial counts for ≤ k keys), filtered to
  *         `count * (k+1) > n_total`.
  *
  * The MG superset guarantee makes the output exactly the true heavy
  * hitters, independent of partition/merge order — deterministic and
  * SQL-oracle-able even though the intermediate sketch is not.
  */
object HeavyHitters {

  /** Items with exact count strictly above `n/(k+1)`, as
    * `(item, c, n_total)` ordered by (c desc, item). */
  def exactHeavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val stream = items.select(col(itemCol).cast("string").as("item"))
    val mg = udaf(MisraGries(k))
    val candidates = stream
      .agg(mg(col("item")).as("__sk"))
      .select(explode(map_keys(col("__sk"))).as("item"))
    val total = stream.agg(count(lit(1)).as("n_total"))
    stream
      .join(broadcast(candidates), Seq("item")) // ≤ k items survive
      .groupBy(col("item"))
      .agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(total)) // 1-row stats attach
      .filter(col("c") * lit(k + 1L) > col("n_total"))
      .select(col("item"), col("c"), col("n_total"))
      .orderBy(col("c").desc, col("item"))
  }

  /** Persistent heavy hitters across epochs — keys that stay hot, not just
    * spike once: for each epoch, the exact top-`k` keys by count (rank
    * tie-broken by key for engine parity); report every key that makes
    * the top-k in at least `minEpochs` epochs. The stability screen that
    * separates structurally heavy keys (salt/isolate them permanently)
    * from one-off bursts (let AQE absorb them).
    *
    * Scale shape: one map-side-combined shuffle to the (epoch, key)
    * grain; the per-epoch rank is a WindowGroupLimit-bounded top-k over
    * the epoch partitioning; the survivor rollup runs on ≤ |epochs|·k
    * rows. Returns (key, n_epochs_top, best_rank, max_cnt). */
  def persistentHitters(
      df: DataFrame,
      epochCol: String,
      keyCol: String,
      k: Int,
      minEpochs: Int): DataFrame = {
    require(k >= 1 && minEpochs >= 1, "need positive k and minEpochs")
    val counts = df.groupBy(col(epochCol).as("__ep"), col(keyCol).as("key"))
      .agg(count(lit(1)).as("__cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__ep").orderBy(col("__cnt").desc, col("key").asc)
    counts.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .groupBy("key")
      .agg(count(lit(1)).as("n_epochs_top"),
        min(col("__rank").cast("long")).as("best_rank"),
        max(col("__cnt")).as("max_cnt"))
      .filter(col("n_epochs_top") >= minEpochs)
  }
}
