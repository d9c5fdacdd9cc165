package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** In-engine ML inference — model scoring compiled to PURE relational
  * expressions (the "ML inference as SQL via operator fusion" idea,
  * ICDE'25 lineage; also what every feature-store push-down does): a
  * small trained model (tree ensemble, linear scorer) becomes literal
  * CASE/arithmetic columns, so inference runs inside whole-stage codegen
  * at scan speed — no UDF fence, no model server round-trip, predicate
  * pushdown and column pruning still apply underneath.
  *
  * One model SPEC generates BOTH faces: [[TreeEnsemble.column]] (Catalyst)
  * and [[TreeEnsemble.sql]] (ANSI SQL for any engine — the oracle replays
  * the exact same tree). Scores are raw additive margins (no sigmoid —
  * transcendentals are the one thing that does NOT replay bit-for-bit
  * across engines; thresholding a margin is equivalent anyway).
  */
object Scoring {

  /** Binary decision tree over named double features: either a leaf value
    * or a `feature < threshold ? left : right` split. */
  sealed trait Tree
  final case class Leaf(value: Double) extends Tree
  final case class Split(feature: String, threshold: Double,
      left: Tree, right: Tree) extends Tree

  /** An additive ensemble (GBDT/RF-style): margin = Σ tree_i(x). */
  final case class TreeEnsemble(trees: Seq[Tree]) {

    /** Catalyst face: nested CASE columns, left-associated sum. */
    def column(feature: String => Column): Column = {
      def one(t: Tree): Column = t match {
        case Leaf(v) => lit(v)
        case Split(f, th, l, r) =>
          when(feature(f) < lit(th), one(l)).otherwise(one(r))
      }
      trees.map(one).reduceLeft(_ + _)
    }

    /** SQL face: the same tree as ANSI CASE text; `feature` maps a name to
      * a SQL expression. Thresholds/leaves are printed with
      * `Double.toString` — the shortest round-trip representation, which
      * every engine parses back to the identical double. */
    def sql(feature: String => String): String = {
      def one(t: Tree): String = t match {
        case Leaf(v) => s"CAST($v AS DOUBLE)"
        case Split(f, th, l, r) =>
          s"(CASE WHEN ${feature(f)} < CAST($th AS DOUBLE) " +
            s"THEN ${one(l)} ELSE ${one(r)} END)"
      }
      trees.map(one).reduceLeft((a, b) => s"($a + $b)")
    }
  }

  /** Hashing-trick linear scorer (Weinberger et al., ICML'09 — the
    * fixed-dimension featurization that needs no vocabulary shuffle):
    * token t contributes `weightUnits[md5Hash60(t) mod dim]`; margin = Σ
    * over the token bag, divided once at the end.
    *
    * Weights are FIXED-POINT integer units (the exactMoneySum
    * discipline): a float fold's value depends on association, and
    * engines disagree on fold order for long lists (DuckDB's list_reduce
    * re-associates vectorized chunks — measured, not hypothetical).
    * Integer sums are order-free, so margin = `units / unitsPerOne` is
    * bit-identical everywhere, and quantized weights are what production
    * scorers ship anyway. */
  def hashedLinearMargin(
      textCol: Column,
      weightUnits: Seq[Long],
      biasUnits: Long,
      unitsPerOne: Double): Column = {
    val dim = weightUnits.length
    val wArr = array(weightUnits.map(lit): _*)
    val toks = split(trim(lower(textCol)), "\\s+")
    val units = aggregate(
      toks,
      lit(biasUnits),
      (acc, t) => acc +
        element_at(wArr,
          (pmod(graft.functions.PortableHash.md5Hash60(t), lit(dim.toLong)) + 1L)
            .cast("int")))
    units.cast("double") / lit(unitsPerOne)
  }

  /** SQL face of [[hashedLinearMargin]] — integer fold (associative, so
    * any engine's reduce order is fine), one final division. */
  def hashedLinearMarginSql(
      textExpr: String,
      weightUnits: Seq[Long],
      biasUnits: Long,
      unitsPerOne: Double): String = {
    val dim = weightUnits.length
    val wArr = weightUnits.mkString("[", ", ", "]")
    val tok = graft.functions.PortableHash.md5Hash60Sql("t")
    s"""(CAST(list_reduce(
       |  list_prepend(CAST($biasUnits AS BIGINT),
       |    list_transform(string_split_regex(trim(lower($textExpr)), '\\s+'),
       |      t -> CAST(list_extract($wArr, CAST((($tok) % $dim) + 1 AS INTEGER)) AS BIGINT))),
       |  (acc, x) -> acc + x) AS DOUBLE) / $unitsPerOne)""".stripMargin
  }
}
