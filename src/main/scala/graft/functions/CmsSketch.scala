package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable frequency sketches (count-min, Cormode & Muthukrishnan
  * 2005) via Spark's own `org.apache.spark.util.sketch.CountMinSketch` —
  * the frequency member of the [[graft.operators.SketchRollup]] family
  * (HLL = distinct, KLL = quantiles, CMS = per-item counts). Answers
  * "how often did THIS key occur" for ANY key at any rollup grain from
  * the tiny sketch table, where [[graft.operators.HeavyHitters]]
  * (Misra–Gries) tracks only the top survivors.
  *
  * Properties the spec pins:
  *  - counters are ADDITIVE: cell-wise sums commute with partitioning,
  *    so merged-path estimates are bit-identical to a one-shot sketch
  *    over the union (not just close);
  *  - estimates never undercount; overcount is bounded by `eps·N`
  *    (eps ≈ e/width) at `1 − delta` confidence (delta ≈ exp(−depth));
  *  - NOT idempotent: re-merging the same partition double-counts
  *    (unlike HLL's order-free register maxima) — replays require the
  *    exactly-once batch-owned-partition contract the curation pipeline
  *    already enforces. Pinned out loud in the spec.
  *
  * All sketches in one rollup must share (depth, width, seed) —
  * `mergeInPlace` refuses mismatches. Buffers keep the live sketch
  * object between rows (KllSketch posture); serialization runs only at
  * spill/shuffle boundaries. */
object CmsSketch {

  /** Serialization shim over the non-Java-serializable sketch. */
  final class CmsWrap(@transient var sk: CountMinSketch) extends java.io.Serializable {
    private def writeObject(o: java.io.ObjectOutputStream): Unit = {
      val bos = new ByteArrayOutputStream()
      sk.writeTo(bos)
      val b = bos.toByteArray
      o.writeInt(b.length)
      o.write(b)
    }
    private def readObject(i: java.io.ObjectInputStream): Unit = {
      val n = i.readInt()
      val b = new Array[Byte](n)
      i.readFully(b)
      sk = CountMinSketch.readFrom(new ByteArrayInputStream(b))
    }
  }

  private def toBytes(sk: CountMinSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    sk.writeTo(bos)
    bos.toByteArray
  }

  /** Build one CMS per group from a string column (nulls skipped).
    * Output: the sketch byte image (~`depth·width·8` bytes). */
  case class CmsBuildAgg(depth: Int, width: Int, seed: Int)
      extends Aggregator[String, CmsWrap, Array[Byte]] {
    require(depth >= 1 && width >= 1, "depth and width must be positive")
    override def zero: CmsWrap = new CmsWrap(CountMinSketch.create(depth, width, seed))
    override def reduce(b: CmsWrap, a: String): CmsWrap = {
      if (a != null) b.sk.addString(a)
      b
    }
    override def merge(x: CmsWrap, y: CmsWrap): CmsWrap = {
      x.sk.mergeInPlace(y.sk)
      x
    }
    override def finish(b: CmsWrap): Array[Byte] = toBytes(b.sk)
    override def bufferEncoder: Encoder[CmsWrap] = Encoders.javaSerialization[CmsWrap]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Merge sketch-bytes columns up a grain and read off the estimated
    * count of each probe item (aligned with `items`). Empty group →
    * zeros (a CMS with nothing added estimates 0 everywhere). */
  case class CmsEstimateAgg(depth: Int, width: Int, seed: Int, items: Seq[String])
      extends Aggregator[Array[Byte], CmsWrap, Seq[Long]] {
    require(items.nonEmpty, "at least one probe item required")
    override def zero: CmsWrap = new CmsWrap(CountMinSketch.create(depth, width, seed))
    override def reduce(b: CmsWrap, bytes: Array[Byte]): CmsWrap = {
      if (bytes != null)
        b.sk.mergeInPlace(CountMinSketch.readFrom(new ByteArrayInputStream(bytes)))
      b
    }
    override def merge(x: CmsWrap, y: CmsWrap): CmsWrap = {
      x.sk.mergeInPlace(y.sk)
      x
    }
    override def finish(b: CmsWrap): Seq[Long] =
      items.map(i => b.sk.estimateCount(i))
    override def bufferEncoder: Encoder[CmsWrap] = Encoders.javaSerialization[CmsWrap]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
