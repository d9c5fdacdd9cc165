package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.sinks.MergeWriter
import graft.sinks.MergeWriter.MergeSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Differential parity for the S12 MERGE semantics: goldens were produced
  * by replaying the reference's upsert flavors through a real SQL engine
  * (DuckDB `INSERT ... ON CONFLICT DO UPDATE`, the same semantics family as
  * the reference's Postgres) over randomized tables —
  * tools/gen_merge_goldens.py. MergeWriter must reproduce every resulting
  * table exactly, the conditional
  * `WHERE excluded.ts >= t.ts` guard is pinned by MergeWriterSpec (DuckDB
  * 1.0's conditional ON CONFLICT evaluation is itself flaky under repeated
  * upserts, so it cannot serve as the oracle for that flavor). */
class MergeGoldenSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", StringType),
    StructField("w", StringType), StructField("ts", TimestampType),
    StructField("lo", LongType), StructField("hi", LongType)))

  private def toRows(n: JsonNode): Seq[Row] =
    n.elements().asScala.map { r =>
      def s(f: String) = if (r.get(f) == null || r.get(f).isNull) null else r.get(f).asText()
      Row(s("k"), s("v"), s("w"),
        Option(s("ts")).map(Timestamp.valueOf).orNull,
        r.get("lo").asLong(), r.get("hi").asLong())
    }.toSeq

  test("MergeWriter matches DuckDB ON CONFLICT DO UPDATE on 12 randomized cases") {
    val mapper = new ObjectMapper()
    val in = getClass.getResourceAsStream("/goldens/merge_upsert_parity.json")
    val cases = try mapper.readTree(in) finally in.close()
    cases.elements().asScala.zipWithIndex.foreach { case (c, i) =>
      val existing = spark.createDataFrame(toRows(c.get("existing")).asJava, schema)
      val batch = spark.createDataFrame(toRows(c.get("batch")).asJava, schema)
      val spec = MergeSpec(
        keys = Seq("k"), overwrite = Seq("v", "ts"),
        coalescePreserving = Seq("w"), minOf = Seq("lo"), maxOf = Seq("hi"),
        updateOnlyIfNewerBy =
          if (c.get("conditional").asBoolean()) Some("ts") else None)
      val got = MergeWriter.merge(existing, batch, spec)
        .orderBy("k").collect().map(_.toString).toSeq
      val want = toRows(c.get("expected")).map(_.toString)
      assert(got == want, s"case $i (conditional=${c.get("conditional")})")
    }
  }
}
