package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k string aggregation — the 100 TB replacement for
  * `sort_array(collect_list(x))[1:k]` (SURVEY §7.3's optional Aggregator,
  * reference A4 `array_agg(title ORDER BY title)[1:3]`): the aggregation
  * buffer holds AT MOST k strings at every moment, on the map side and in
  * every merge, so an adversarially hot group costs O(k) memory instead
  * of materializing its whole value list.
  *
  * Contract match with the composed form: k alphabetically-first non-null
  * inputs, joined with `sep` — bit-identical for ASCII/BMP strings. (Scala
  * compares strings by UTF-16 code unit, Spark's sort_array by UTF-8
  * binary = code point; the two diverge only on supplementary-plane
  * characters. The parity spec pins equality on realistic data.)
  *
  * Null inputs are skipped — mirroring `collect_list`'s null-dropping, so
  * `when(pred, value)` filtered aggregation composes identically.
  */
case class BoundedTopKStrings(k: Int, sep: String = " | ")
    extends Aggregator[String, Seq[String], String] {
  require(k > 0, "k must be positive")

  override def zero: Seq[String] = Nil

  override def reduce(b: Seq[String], a: String): Seq[String] =
    if (a == null) b
    else if (b.length < k) (b :+ a).sorted
    else if (a < b.last) (b.init :+ a).sorted
    else b

  override def merge(x: Seq[String], y: Seq[String]): Seq[String] =
    (x ++ y).sorted.take(k)

  override def finish(b: Seq[String]): String = b.mkString(sep)

  override def bufferEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

/** A (score, id) pair for [[BoundedTopKPairs]]. */
case class ScoredId(score: Double, id: Long)

/** Bounded top-k by (score desc, id asc) — the 100 TB replacement for the
  * `row_number() OVER (PARTITION BY q ORDER BY score DESC, id) <= k`
  * pattern when EVERY key is a query (the mutual-kNN grain, q131): the
  * window formulation shuffles and sorts the full candidate table
  * (O(n²) rows for an all-pairs scan); this buffer holds at most k pairs
  * per group on the map side and in every merge, so the exchange carries
  * only k rows per (group × map partition). Ids are unique per group, so
  * the (score desc, id asc) order is total and the bounded buffer is
  * EXACTLY the window's top-k — same rows, same ranks (buffer order =
  * rank order; derive rank with posexplode). */
case class BoundedTopKPairs(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, "k must be positive")

  private def lt(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[ScoredId] = Nil

  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (a == null) b
    else if (b.length >= k && !lt(a, b.last)) b
    else {
      val (pre, post) = b.span(x => lt(x, a))
      ((pre :+ a) ++ post).take(k)
    }

  override def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ScoredId]
    var (i, j) = (0, 0)
    while (out.length < k && (i < x.length || j < y.length)) {
      if (j >= y.length || (i < x.length && lt(x(i), y(j)))) {
        out += x(i); i += 1
      } else { out += y(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(b: Seq[ScoredId]): Seq[ScoredId] = b

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
