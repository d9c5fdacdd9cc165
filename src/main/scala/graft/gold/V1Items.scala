package graft.gold

import graft.operators.Effective
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The v1 pilot item path (reference `sql/schema.sql:15-88`): `items` keyed
  * by url_hash, `item_overrides` resolved latest-wins, and the two views —
  * `latest_overrides` (distinct-on url_hash by created_at desc) and
  * `items_effective` (left join + coalesce of risk/controlled).
  */
object V1Items {

  /** `latest_overrides` (`sql/schema.sql:67-76`). The reference's
    * `distinct on` has an implicit physical tiebreak on equal created_at;
    * we make it deterministic with the override id. */
  def latestOverrides(itemOverrides: DataFrame): DataFrame =
    Effective.latestWins(itemOverrides, Seq("url_hash"),
      Seq(col("created_at").desc, col("id").desc))
      .select(col("url_hash"), col("risk_override"), col("controlled_override"),
        col("reason"), col("user_id"), col("created_at"))

  /** `items_effective` (`sql/schema.sql:78-88`). */
  def itemsEffective(items: DataFrame, itemOverrides: DataFrame): DataFrame = {
    val lo = broadcast(latestOverrides(itemOverrides)
      .withColumnRenamed("created_at", "override_created_at")
      .withColumnRenamed("reason", "override_reason")
      .withColumnRenamed("user_id", "override_user_id"))
    items.join(lo, Seq("url_hash"), "left")
      .withColumn("risk_effective", coalesce(col("risk_override"), col("risk_raw")))
      .withColumn("controlled_effective",
        coalesce(col("controlled_override"), col("controlled_raw")))
      .drop("risk_override", "controlled_override")
  }
}
