package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract validation — the expectation suite a corpus
  * ingest runs before anything downstream trusts the batch (the Deequ /
  * Great-Expectations shape, re-expressed as plain Spark aggregates).
  *
  * Reference analogue: the scattered imperative guards in the reference's
  * ingest (`src/ingest_v2.py` row-count/empty-field checks) — centralized
  * into a typed check list producing one auditable report.
  *
  * Scale shape: every ROW-LOCAL check (null, range, set, regex) compiles
  * into two counters of a SINGLE aggregate pass — one scan total no
  * matter how many checks. `Unique` adds one shuffle to its key grain;
  * `ForeignKey` one join against the distinct dim keys. Nothing is
  * collected; the report is a DataFrame of one row per check.
  *
  * Violation semantics (per check, `n_checked` / `n_violations`):
  *  - `NotNull`  — all rows / rows where the column is null
  *  - `InRange`  — non-null rows / values outside `[lo, hi]`
  *  - `InSet`    — non-null rows / values not in the set
  *  - `Matches`  — non-null rows / values not matching the regex
  *  - `Unique`   — rows with a fully non-null key / rows in key groups
  *                 of size > 1 (rows, not groups: the rework size)
  *  - `ForeignKey` — rows with a non-null key / rows with no dim match
  */
object Expectations {

  sealed trait Check { def name: String }
  /** `not_null:<col>` */
  final case class NotNull(col: String) extends Check {
    val name = s"not_null:$col"
  }
  /** `unique:<c1,c2>` */
  final case class Unique(cols: Seq[String]) extends Check {
    require(cols.nonEmpty, "unique check needs at least one column")
    val name = s"unique:${cols.mkString(",")}"
  }
  /** `in_range:<col>`; bounds are Columns so dates/decimals work. */
  final case class InRange(col: String, lo: Column, hi: Column) extends Check {
    val name = s"in_range:$col"
  }
  /** `in_set:<col>` */
  final case class InSet(col: String, values: Seq[Any]) extends Check {
    require(values.nonEmpty, "in_set check needs at least one value")
    val name = s"in_set:$col"
  }
  /** `regex:<col>`; Java regex via `rlike` — keep patterns in the
    * RE2-compatible subset when cross-engine replay matters. */
  final case class Matches(col: String, pattern: String) extends Check {
    val name = s"regex:$col"
  }
  /** `fk:<col>`; `dim` joins by its distinct `dimCol` keys. */
  final case class ForeignKey(col: String, dim: DataFrame, dimCol: String) extends Check {
    val name = s"fk:$col"
  }

  /** One row per check: `(check_name, n_checked, n_violations, pass)`,
    * ordered by check name. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    val names = checks.map(_.name)
    require(names.distinct.size == names.size,
      s"check names must be unique, got ${names.mkString(", ")}")
    require(!df.columns.exists(c => c.startsWith("__ex_")),
      "input must not contain reserved internal columns __ex_*")

    // (checkedCond, violationCond) per row-local check
    val rowLocal = checks.zipWithIndex.collect {
      case (c: NotNull, i) =>
        (c.name, i, lit(true), col(c.col).isNull)
      case (c: InRange, i) =>
        (c.name, i, col(c.col).isNotNull, !col(c.col).between(c.lo, c.hi))
      case (c: InSet, i) =>
        (c.name, i, col(c.col).isNotNull, !col(c.col).isin(c.values: _*))
      case (c: Matches, i) =>
        (c.name, i, col(c.col).isNotNull, !col(c.col).rlike(c.pattern))
    }
    val rowLocalReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = rowLocal.flatMap { case (_, i, checked, viol) =>
          Seq(coalesce(Rollups.countIf(checked), lit(0L)).as(s"__ex_c$i"),
            coalesce(Rollups.countIf(checked && viol), lit(0L)).as(s"__ex_v$i"))
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val stackArgs = rowLocal
          .map { case (n, i, _, _) => s"'${n.replace("'", "''")}', __ex_c$i, __ex_v$i" }
          .mkString(", ")
        Some(one.select(expr(
          s"stack(${rowLocal.size}, $stackArgs) AS (check_name, n_checked, n_violations)")))
      }

    val grouped = checks.collect {
      case c: Unique =>
        df.where(c.cols.map(col(_).isNotNull).reduce(_ && _))
          .groupBy(c.cols.map(col): _*)
          .agg(count(lit(1)).as("__ex_n"))
          .agg(
            coalesce(sum(col("__ex_n")), lit(0L)).as("n_checked"),
            coalesce(sum(when(col("__ex_n") > 1, col("__ex_n"))), lit(0L))
              .as("n_violations"))
          .select(lit(c.name).as("check_name"), col("n_checked"), col("n_violations"))
      case c: ForeignKey =>
        df.select(col(c.col).as("__ex_k")).where(col("__ex_k").isNotNull)
          .join(c.dim.select(col(c.dimCol).as("__ex_dk")).distinct(),
            col("__ex_k") === col("__ex_dk"), "left")
          .agg(
            count(lit(1)).as("n_checked"),
            coalesce(Rollups.countIf(col("__ex_dk").isNull), lit(0L))
              .as("n_violations"))
          .select(lit(c.name).as("check_name"), col("n_checked"), col("n_violations"))
    }

    (rowLocalReport.toSeq ++ grouped)
      .reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("check_name")
  }
}
