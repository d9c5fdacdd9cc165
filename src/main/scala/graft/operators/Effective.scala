package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The override / effective-value operator family.
  *
  * The single most load-bearing semantic of the reference system is the
  * "override coalesce chain": a raw label, optionally an ML-provided label,
  * optionally one or more human override tables, resolved with a fixed
  * precedence (reference: `sql/serp_feature_daily_mv.sql:8`,
  * `dashboard_app/app.py:3397-3401` — item override > url override > llm >
  * raw). The reference also expresses "latest override wins" as Postgres
  * `distinct on (key) ... order by created_at desc` (`sql/schema.sql:67-76`).
  *
  * Spark-first design notes (100 TB posture):
  *  - Override tables are human-entered and tiny relative to facts; join them
  *    with [[org.apache.spark.sql.functions.broadcast]] so the fact table
  *    never shuffles for an override join.
  *  - `latestWins` is a dedup-window (`row_number() == 1`), which shuffles the
  *    *override* table only — never the fact side.
  *  - The coalesce itself is a pure projection: codegen-friendly, no UDFs.
  */
object Effective {

  /** `coalesce` precedence chain — first non-null wins (reference P1). */
  def coalesceChain(cols: Column*): Column = coalesce(cols: _*)

  /** Latest-row-wins dedup: Postgres `distinct on (keys) order by ord desc`.
    * (reference J3/W6: `sql/schema.sql:67-76`, `dashboard_app/app.py:5489-5509`)
    *
    * `orderCols` are applied descending-first priority as given (caller passes
    * e.g. `Seq(col("created_at").desc, col("id").desc)` — always include a
    * unique tiebreaker for determinism).
    */
  def latestWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Left-join a (small, broadcast) override table and produce effective
    * columns via the coalesce chain.
    *
    * @param fact       the big fact table
    * @param overrides  small override table (will be broadcast)
    * @param joinKeys   equi-join key columns present in both
    * @param chains     output column name -> precedence-ordered source columns
    *                   (override columns first, raw columns last)
    */
  def withEffective(
      fact: DataFrame,
      overrides: DataFrame,
      joinKeys: Seq[String],
      chains: Map[String, Seq[Column]]): DataFrame = {
    val joined = fact.join(broadcast(overrides), joinKeys, "left")
    chains.foldLeft(joined) { case (df, (name, cols)) =>
      df.withColumn(name, coalesce(cols: _*))
    }
  }
}
