package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "first document text"), (1L, "second one"), (2L, "third"), (3L, "fourth"))
    .toDF("doc_id", "text")
  private lazy val media = Multimodal.synthesizeMedia(docs, "doc_id", "text")

  test("synthesized media matches the multimodal schema contract") {
    assert(media.schema.fieldNames.toSeq ==
      Multimodal.mediaSchema.fieldNames.toSeq)
    assert(media.count() == 4)
    val types = media.select("media_type").distinct().as[String].collect().toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("decodeFeatures is deterministic, batched, and null-safe") {
    val decoded = Multimodal.decodeFeatures(media, dim = 8)
    val rows = decoded.select("media_id", "feature", "decode_ok")
      .as[(Long, Seq[Float], Boolean)].collect().sortBy(_._1)
    assert(rows.forall(_._3))
    assert(rows.forall(_._2.length == 8))
    // deterministic across runs
    val again = Multimodal.decodeFeatures(media, dim = 8)
      .select("media_id", "feature", "decode_ok")
      .as[(Long, Seq[Float], Boolean)].collect().sortBy(_._1)
    assert(rows.toSeq == again.toSeq)
    // null payload -> decode_ok = false
    val withNull = media.withColumn("payload",
      when(col("media_id") === 0, lit(null).cast("binary")).otherwise(col("payload")))
    val nullRow = Multimodal.decodeFeatures(withNull)
      .filter(col("media_id") === 0).select("decode_ok").as[Boolean].head()
    assert(!nullRow)
  }

  test("sampleFrames explodes one row per sampled frame") {
    val frames = Multimodal.sampleFrames(media, everyMs = 40L)
    // only video rows (doc_id % 3 == 2): id 2, duration 80ms -> frames 0,40
    val got = frames.select("media_id", "frame_ms").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 0L), (2L, 40L)))
  }
}
