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
    // real codec path only on image rows (id % 3 == 0); opaque stand-ins
    // take the fallback with decode_ok = false
    assert(rows.forall { case (id, _, ok) => ok == (id % 3 == 0) })
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

  test("image rows round-trip through the real PNG codec exactly") {
    val decoded = Multimodal.decodeFeatures(media, dim = 8)
      .filter(col("media_type") === "image")
      .select("media_id", "decoded_width", "decoded_height", "gray_sum", "feature")
      .as[(Long, Int, Int, Long, Seq[Float])].collect()
    assert(decoded.nonEmpty)
    decoded.foreach { case (id, w, h, gs, feat) =>
      // decoded dims == the metadata the encoder was given
      assert(w == (id % 32 + 1).toInt && h == (id % 24 + 1).toInt)
      // decoded pixels == the closed-form pixel law, checksum + histogram
      val grays = for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.pixelGray(id, x, y)
      assert(gs == grays.map(_.toLong).sum)
      val hist = new Array[Float](8)
      grays.foreach(g => hist(g * 8 / 256) += 1f)
      assert(feat == hist.toSeq)
    }
  }

  test("sampleFrames explodes one row per sampled frame") {
    val frames = Multimodal.sampleFrames(media, everyMs = 40L)
    // only video rows (doc_id % 3 == 2): id 2, duration 80ms -> frames 0,40
    val got = frames.select("media_id", "frame_ms").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 0L), (2L, 40L)))
  }
}
