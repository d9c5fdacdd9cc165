package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support for training-data pipelines: image/audio/video
  * payloads travel as opaque `binary` columns next to typed metadata, and
  * decode / feature-extraction runs batched per partition.
  *
  * The decode kernels themselves are STUBS — this container ships no image
  * or audio codecs — implemented as deterministic fakes with the real
  * Spark-side plumbing: schema contract, per-partition batching (the Scala
  * analogue of `mapInPandas` arrow batches), partition sizing, and
  * column pruning. Swapping `stubDecodeImage` for a JNI/codec call changes
  * no plan shape.
  *
  * Scale posture: payload columns are huge relative to metadata — always
  * prune them out of queries that don't decode (parquet column pruning
  * makes the scan skip the bytes entirely), and repartition by size before
  * decode so one partition's batch fits executor memory.
  */
object Multimodal {

  /** Canonical multimodal record schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("source_url", StringType)))

  /** Wrap a text/doc table into multimodal shape with synthetic payloads
    * (deterministic bytes from the text — stands in for real image bytes). */
  def synthesizeMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      (when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio").otherwise("video")).as("media_type"),
      to_binary(sha2(col(textCol), 256), lit("hex")).as("payload"),
      lit("application/octet-stream").as("mime"),
      (col(idCol) % 1920 + 1).cast("int").as("width"),
      (col(idCol) % 1080 + 1).cast("int").as("height"),
      (col(idCol) * 40L).as("duration_ms"),
      concat(lit("https://media.example/"), col(idCol)).as("source_url"))

  /** STUB decode: a real implementation would run a codec over the payload
    * bytes; the fake derives a deterministic fixed-length "embedding" from
    * them. Runs batched per partition so codec/model state is initialized
    * once per partition, not per row — the plumbing a real decoder needs. */
  def decodeFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val inSchema = media.schema
    val outSchema = inSchema
      .add("feature", ArrayType(FloatType), nullable = true)
      .add("decode_ok", BooleanType, nullable = false)
    val payloadIdx = inSchema.fieldIndex("payload")
    implicit val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      // per-partition init happens HERE (codec handle, model session, ...)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null || payload.isEmpty)
          Row.fromSeq(r.toSeq :+ null :+ false)
        else {
          // ??? real codec goes here; deterministic fake feature instead:
          val feat = Array.tabulate(dim) { i =>
            (payload(i % payload.length) & 0xff).toFloat / 255.0f
          }
          Row.fromSeq(r.toSeq :+ feat :+ true)
        }
      }
    }
  }

  /** Frame sampling contract for video rows: one output row per sampled
    * frame index (metadata-only here; a real decoder would attach the frame
    * payload). Native explode keeps it distributed and codegen'd. */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media.filter(col("media_type") === "video" && col("duration_ms") > 0)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))))
      .select(col("media_id"), col("frame_ms"), col("mime"), col("source_url"))
}
