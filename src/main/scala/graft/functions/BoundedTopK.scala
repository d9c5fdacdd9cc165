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
