package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support for training-data pipelines: image/audio/video
  * payloads travel as opaque `binary` columns next to typed metadata, and
  * decode / feature-extraction runs batched per partition.
  *
  * The image path is a REAL codec round-trip with no external dependency:
  * `synthesizeMedia` encodes deterministic pixels to actual PNG bytes with
  * the JDK's `ImageIO`, and `decodeFeatures` decodes them back with
  * `ImageIO.read`, emitting the decoded dimensions, an exact gray-value
  * checksum, and a pixel-histogram feature vector. Because the pixel
  * content is a closed-form function of (media_id, x, y), the whole
  * encode→decode→extract chain is independently replayable by a SQL
  * oracle — a genuine end-to-end codec test. Audio/video payloads stay
  * opaque stand-ins (this container ships no audio codecs): they take the
  * documented deterministic-fake feature path with `decode_ok = false`.
  *
  * Scale posture: payload columns are huge relative to metadata — always
  * prune them out of queries that don't decode (parquet column pruning
  * makes the scan skip the bytes entirely), and repartition by size before
  * decode so one partition's batch fits executor memory. Codec state is
  * initialized per partition, never per row.
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

  /** Deterministic pixel law shared by the encoder and any oracle:
    * gray(id, x, y) — integer arithmetic only, so replay is exact. */
  def pixelGray(id: Long, x: Int, y: Int): Int =
    java.lang.Math.floorMod(id * 31L + x * 7L + y * 13L, 256L).toInt

  /** Encode the deterministic gray image for `id` as real PNG bytes
    * (JDK ImageIO; PNG is lossless, so the round-trip is exact). */
  private[multimodal] def encodePng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = pixelGray(id, x, y)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // Fixture synthesis is the one place a Scala UDF is acceptable: PNG
  // encoding is imperative byte production, not a hot relational path.
  private lazy val encodePngUdf =
    udf((id: Long, w: Int, h: Int) => encodePng(id, w, h))

  /** Wrap a text/doc table into multimodal shape. Image rows (id % 3 == 0)
    * carry REAL PNG payloads of the deterministic pixel law at the
    * metadata (width, height); audio/video rows carry opaque deterministic
    * bytes (sha256 of the text) — no audio codec ships in-container. */
  def synthesizeMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(
      col(idCol).cast("long").as("media_id"),
      (when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio").otherwise("video")).as("media_type"),
      to_binary(sha2(col(textCol), 256), lit("hex")).as("opaque"),
      (col(idCol) % 32 + 1).cast("int").as("width"),
      (col(idCol) % 24 + 1).cast("int").as("height"),
      (col(idCol) * 40L).as("duration_ms"),
      concat(lit("https://media.example/"), col(idCol)).as("source_url"))
    base.select(
      col("media_id"),
      col("media_type"),
      when(col("media_type") === "image",
        encodePngUdf(col("media_id"), col("width"), col("height")))
        .otherwise(col("opaque")).as("payload"),
      when(col("media_type") === "image", lit("image/png"))
        .otherwise(lit("application/octet-stream")).as("mime"),
      col("width"), col("height"), col("duration_ms"), col("source_url"))
  }

  /** Batched per-partition decode + feature extraction.
    *
    * Real path: `ImageIO.read` over the payload bytes — emits
    * `decode_ok = true`, the DECODED `decoded_width`/`decoded_height`,
    * `gray_sum` (exact sum of the gray channel over all pixels), and a
    * `dim`-bucket gray histogram as the feature vector.
    *
    * Fallback (payload the JDK has no reader for — the opaque audio/video
    * stand-ins): a deterministic byte-derived fake feature with
    * `decode_ok = false`, so downstream plumbing still flows for fixtures
    * while the flag records that no codec ran. Null/empty payloads yield
    * a null feature. */
  def decodeFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    require(dim >= 1 && dim <= 256, "dim must be in [1, 256] (gray buckets)")
    val inSchema = media.schema
    val outSchema = inSchema
      .add("feature", ArrayType(FloatType), nullable = true)
      .add("decode_ok", BooleanType, nullable = false)
      .add("decoded_width", IntegerType, nullable = true)
      .add("decoded_height", IntegerType, nullable = true)
      .add("gray_sum", LongType, nullable = true)
    val payloadIdx = inSchema.fieldIndex("payload")
    implicit val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      // per-partition init: keep ImageIO's scratch in memory (no temp-file
      // cache churn per image); reader plugins are scanned once per JVM
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null || payload.isEmpty)
          Row.fromSeq(r.toSeq :+ null :+ false :+ null :+ null :+ null)
        else {
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case _: java.io.IOException => null }
          if (img != null) {
            val w = img.getWidth
            val h = img.getHeight
            val hist = new Array[Float](dim)
            var graySum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val g = img.getRGB(x, y) & 0xff
                graySum += g
                hist((g * dim) / 256) += 1f
                x += 1
              }
              y += 1
            }
            Row.fromSeq(r.toSeq :+ hist :+ true :+ w :+ h :+ graySum)
          } else {
            val feat = Array.tabulate(dim) { i =>
              (payload(i % payload.length) & 0xff).toFloat / 255.0f
            }
            Row.fromSeq(r.toSeq :+ feat :+ false :+ null :+ null :+ null)
          }
        }
      }
    }
  }

  /** Average-hash (aHash) perceptual fingerprint of each decodable image
    * payload — the classic perceptual-dedup primitive: sample the decoded
    * gray image on a `grid`×`grid` nearest-neighbor lattice, threshold
    * each sample against the floor-mean of the lattice, and pack the
    * resulting `grid²` bits into 16-bit band integers (`grid²/16` bands).
    *
    * Integer-exact end to end: nearest-neighbor index `(i·w) div grid`,
    * floor mean `Σg div grid²`, bit `g ≥ mean` — so an engine that knows
    * the pixel law (the [[synthesizeMedia]] fixtures are closed-form; PNG
    * is lossless) replays the fingerprint without touching the codec,
    * while THIS path exercises the real `ImageIO` decode. Bands of 16
    * bits rather than one 64-bit word keep every value in positive-int
    * range on every engine (no sign-bit/arithmetic-shift portability
    * traps) and are exactly the LSH banding grain [[graft.operators.Dedup
    * .aHashPairs]] buckets on.
    *
    * Rows whose payload the JDK cannot decode (the opaque audio/video
    * stand-ins) are dropped — a perceptual hash of undecodable bytes is
    * meaningless. Output: `(media_id, bands array<int>)`. */
  def aHashBands(media: DataFrame, grid: Int = 8): DataFrame = {
    require(grid >= 4 && (grid * grid) % 16 == 0,
      "grid^2 must split into 16-bit bands")
    val nBands = grid * grid / 16
    val inSchema = media.schema
    val idIdx = inSchema.fieldIndex("media_id")
    val payloadIdx = inSchema.fieldIndex("payload")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("bands", ArrayType(IntegerType, containsNull = false),
        nullable = false)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null || payload.isEmpty) None
        else {
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case _: java.io.IOException => null }
          if (img == null) None
          else {
            val w = img.getWidth
            val h = img.getHeight
            val g = new Array[Int](grid * grid)
            var sum = 0L
            var j = 0
            while (j < grid) {
              var i = 0
              while (i < grid) {
                val px = img.getRGB((i * w) / grid, (j * h) / grid) & 0xff
                g(j * grid + i) = px
                sum += px
                i += 1
              }
              j += 1
            }
            val mean = sum / (grid * grid)
            val bands = new Array[Int](nBands)
            var p = 0
            while (p < grid * grid) {
              if (g(p) >= mean) bands(p / 16) |= 1 << (p % 16)
              p += 1
            }
            Some(Row(r.getLong(idIdx), bands.toSeq))
          }
        }
      }
    }
  }

  /** Both perceptual fingerprints of each decodable image in ONE decode
    * pass: the [[aHashBands]] average hash plus its gradient twin dHash —
    * the pair the cross-grid dedup query (q233) buckets on. aHash
    * thresholds absolute gray against the lattice mean, so smooth
    * brightness/contrast drift flips every bit whose gray sits near the
    * mean; dHash compares each lattice sample against its RIGHT neighbor
    * (`grid+1`×`grid` samples → `grid²` sign bits), so any perturbation
    * that preserves local gradients — global offset, smooth illumination
    * ramps — leaves it intact. Pairing on the UNION of both hashes' bands
    * ([[graft.operators.Dedup.dualHashPairs]]) keeps recall where either
    * family survives the edit.
    *
    * Integer-exact like aHash: dHash samples at `x=(i·w) div (grid+1)`,
    * `y=(j·h) div grid`, bit `j·grid+i` set iff `g(i+1,j) > g(i,j)`
    * (strict — ties are 0 in every engine). Output:
    * `(media_id, abands array<int>, dbands array<int>)`, bands 16-bit as
    * in [[aHashBands]]. Undecodable payloads are dropped. */
  def perceptualHashBands(media: DataFrame, grid: Int = 8): DataFrame = {
    require(grid >= 4 && (grid * grid) % 16 == 0,
      "grid^2 must split into 16-bit bands")
    val nBands = grid * grid / 16
    val inSchema = media.schema
    val idIdx = inSchema.fieldIndex("media_id")
    val payloadIdx = inSchema.fieldIndex("payload")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("abands", ArrayType(IntegerType, containsNull = false),
        nullable = false),
      StructField("dbands", ArrayType(IntegerType, containsNull = false),
        nullable = false)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null || payload.isEmpty) None
        else {
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case _: java.io.IOException => null }
          if (img == null) None
          else {
            val w = img.getWidth
            val h = img.getHeight
            // aHash lattice: grid x grid
            val g = new Array[Int](grid * grid)
            var sum = 0L
            var j = 0
            while (j < grid) {
              var i = 0
              while (i < grid) {
                val px = img.getRGB((i * w) / grid, (j * h) / grid) & 0xff
                g(j * grid + i) = px
                sum += px
                i += 1
              }
              j += 1
            }
            val mean = sum / (grid * grid)
            val abands = new Array[Int](nBands)
            var p = 0
            while (p < grid * grid) {
              if (g(p) >= mean) abands(p / 16) |= 1 << (p % 16)
              p += 1
            }
            // dHash lattice: (grid+1) x grid, bit = right-neighbor gradient
            val dbands = new Array[Int](nBands)
            j = 0
            while (j < grid) {
              val y = (j * h) / grid
              var prev = img.getRGB(0, y) & 0xff // x index (0*w)/(grid+1) = 0
              var i = 0
              while (i < grid) {
                val cur = img.getRGB(((i + 1) * w) / (grid + 1), y) & 0xff
                if (cur > prev) {
                  val q = j * grid + i
                  dbands(q / 16) |= 1 << (q % 16)
                }
                prev = cur
                i += 1
              }
              j += 1
            }
            Some(Row(r.getLong(idIdx), abands.toSeq, dbands.toSeq))
          }
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
