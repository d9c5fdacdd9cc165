package graft

import java.sql.Timestamp

import graft.gold.V1Items
import org.apache.spark.sql.functions._

class V1ItemsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latest_overrides + items_effective: latest wins, coalesce precedence") {
    val items = Seq(
      ("i1", "e1", "news", "h1", "risk", Some(true), "t1"),
      ("i2", "e1", "serp", "h2", "no_risk", Some(false), "t2"),
      ("i3", "e1", "news", "h3", "unknown", None, "t3")
    ).toDF("id", "entity_id", "source_type", "url_hash", "risk_raw",
      "controlled_raw", "title")
    val overrides = Seq(
      ("o1", "h1", "no_risk", Some(false), ts("2025-01-01 00:00:00")),
      ("o2", "h1", "risk", Some(true), ts("2025-02-01 00:00:00")), // latest for h1
      ("o3", "h2", "risk", None, ts("2025-01-15 00:00:00"))
    ).toDF("id", "url_hash", "risk_override", "controlled_override", "created_at")
      .withColumn("reason", lit(null: String))
      .withColumn("user_id", lit(null: String))

    val lo = V1Items.latestOverrides(overrides)
    assert(lo.count() == 2)
    assert(lo.filter(col("url_hash") === "h1").select("risk_override")
      .as[String].head() == "risk")

    val eff = V1Items.itemsEffective(items, overrides)
      .select("url_hash", "risk_effective", "controlled_effective")
      .as[(String, String, Option[Boolean])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // h1: latest override (risk, true) wins over raw
    assert(eff("h1") == (("risk", Some(true))))
    // h2: risk overridden, controlled_override null -> falls back to raw false
    assert(eff("h2") == (("risk", Some(false))))
    // h3: no override at all -> raw values (controlled_raw null stays null)
    assert(eff("h3") == (("unknown", None)))
  }
}
