package graft

import java.sql.Date

import graft.rollups.BrandImpact
import org.apache.spark.sql.functions._

class BrandImpactSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tagDaily = Seq(
    ("Fraud", "Acme", "2025-06-01"), ("Fraud", "Acme", "2025-06-02"),
    ("Fraud", "Acme", "2025-06-05"), // gap -> 2nd episode
    ("Fraud", "Globex", "2025-06-04"), ("Fraud", "Globex", "2025-06-05"),
    ("Data Breaches", "Initech", "2025-06-03")
  ).toDF("tag", "entity_name", "ds")
    .select(col("tag"), col("entity_name"), col("ds").cast("date").as("date"))

  test("summary: episode windows, affected counts, active-on-end") {
    val got = BrandImpact.summary(tagDaily)
      .as[(String, Long, Long, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val fraud = got("Fraud")
    assert(fraud._2 == 2) // Acme + Globex
    assert(fraud._3 == 3) // Acme x2 episodes + Globex x1
    assert(math.abs(fraud._4 - 5.0 / 3.0) < 1e-12) // (2+1+2)/3
    assert(fraud._5 == 2)
    assert(fraud._6 == 2) // both end on 2025-06-05 (range end)
    val breach = got("Data Breaches")
    assert(breach._2 == 1 && breach._6 == 0)
  }

  test("dailySeries: gap-free zero-filled spine per tag") {
    val got = BrandImpact.dailySeries(tagDaily)
      .filter(col("tag") === "Fraud")
      .select(col("date").cast("string"), col("active_brands"))
      .as[(String, Long)].collect().toMap
    assert(got.size == 5) // 06-01..06-05 inclusive
    assert(got("2025-06-01") == 1)
    assert(got("2025-06-03") == 0) // zero-filled gap day
    assert(got("2025-06-05") == 2)
  }
}
