package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-pattern mining over per-key ordered event streams — the
  * contiguous-subsequence slice of PrefixSpan (Pei et al., ICDE'01): which
  * length-3 event paths do many users actually take. Downstream of the
  * q94-style transition matrix: transitions answer "what follows X",
  * trigram patterns answer "which whole paths are common" (funnel
  * discovery, UX loop detection, abuse-pattern screens).
  *
  * A-priori prune before trigram formation: a trigram (a,b,c) can only be
  * frequent if bigrams (a,b) AND (b,c) are — so infrequent bigrams are
  * dropped FIRST and the trigram aggregation never materializes patterns
  * whose prefix/suffix already failed support. With a type vocabulary V
  * that caps candidate trigrams at |frequent bigrams| fan-in, not |V|³ —
  * the same candidate-generation discipline as q101's pair mining.
  *
  * Scale shape: one window pass per user (shuffle on the user key — skew =
  * one power user, bounded by their own event count), two map-side-combined
  * aggregates at the (pattern, user) then pattern grain. Support is
  * DISTINCT-user (pattern spam by one user counts once).
  */
object SeqPatterns {

  /** Frequent contiguous event trigrams by distinct-user support.
    * `orderCols` must totally order each user's events (ties would make
    * lead() nondeterministic). Returns
    * `(t1, t2, t3, support, n_occurrences)` for patterns with
    * support >= minSupport, both bigram halves frequent. */
  def frequentTrigrams(
      events: DataFrame,
      userCol: String,
      orderCols: Seq[Column],
      typeCol: String,
      minSupport: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(orderCols: _*)
    val laced = events.select(
      col(userCol).as("u"), col(typeCol).as("t1"),
      lead(col(typeCol), 1).over(w).as("t2"),
      lead(col(typeCol), 2).over(w).as("t3"))

    val bigrams = laced.filter(col("t2").isNotNull)
      .groupBy(col("t1"), col("t2"))
      .agg(count_distinct(col("u")).as("sup"))
      .filter(col("sup") >= minSupport)
      .select(col("t1").as("b1"), col("t2").as("b2"))

    val tri = laced.filter(col("t3").isNotNull)
      .join(bigrams.toDF("p1", "p2"),
        col("t1") === col("p1") && col("t2") === col("p2"), "left_semi")
      .join(bigrams.toDF("s1", "s2"),
        col("t2") === col("s1") && col("t3") === col("s2"), "left_semi")

    tri.groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count_distinct(col("u")).as("support"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("support") >= minSupport)
  }
}
