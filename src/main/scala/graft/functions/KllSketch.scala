package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketches (Datasketches KLL, Karnin–Lang–Liberty
  * 2016) — the quantile twin of the [[graft.operators.SketchRollup]] HLL
  * family: pre-aggregate each fine partition ONCE into a ~KB sketch, and
  * answer any later percentile question — any grain, any prob, late
  * partitions folded in — from the tiny sketch table, never re-reading the
  * facts. The exact kernels ([[graft.operators.Profiling]]) stay the
  * bit-parity path; this is the single-pass/incremental path with a proven
  * rank-error envelope (~1.65% at k=200, 99% confidence), spec-pinned
  * against the exact CDF.
  *
  * Buffers hold the sketch OBJECT between rows (Spark's ScalaAggregator
  * keeps typed buffers un-serialized inside ObjectHashAggregate; the
  * java-serialization encoder below runs only at spill/shuffle
  * boundaries), so the per-row cost is one KLL update — no per-row
  * serialize/heapify. */
object KllSketch {

  /** Serialization shim: the heap sketch is not Java-serializable, so the
    * wrapper round-trips the compact byte image at JVM-serialization
    * boundaries and keeps the live sketch otherwise. */
  final class KllWrap(@transient var sk: KllDoublesSketch) extends java.io.Serializable {
    private def writeObject(o: java.io.ObjectOutputStream): Unit = {
      val b = sk.toByteArray
      o.writeInt(b.length)
      o.write(b)
    }
    private def readObject(i: java.io.ObjectInputStream): Unit = {
      val n = i.readInt()
      val b = new Array[Byte](n)
      i.readFully(b)
      sk = KllDoublesSketch.heapify(Memory.wrap(b))
    }
  }

  /** Build one KLL sketch per group from a double column (nulls skipped,
    * like every aggregate). Output: the compact sketch bytes. */
  case class KllBuildAgg(k: Int)
      extends Aggregator[java.lang.Double, KllWrap, Array[Byte]] {
    require(k >= 8, "k >= 8")
    override def zero: KllWrap = new KllWrap(KllDoublesSketch.newHeapInstance(k))
    override def reduce(b: KllWrap, a: java.lang.Double): KllWrap = {
      if (a != null) b.sk.update(a.doubleValue())
      b
    }
    override def merge(x: KllWrap, y: KllWrap): KllWrap = {
      x.sk.merge(y.sk)
      x
    }
    override def finish(b: KllWrap): Array[Byte] = b.sk.toByteArray
    override def bufferEncoder: Encoder[KllWrap] = Encoders.javaSerialization[KllWrap]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Merge sketch-bytes columns up a grain and evaluate `probs` (inclusive
    * rank criterion, the Datasketches default). Null/empty → null. */
  case class KllQuantilesAgg(k: Int, probs: Seq[Double])
      extends Aggregator[Array[Byte], KllWrap, Seq[Double]] {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0), "probs in [0,1]")
    override def zero: KllWrap = new KllWrap(KllDoublesSketch.newHeapInstance(k))
    override def reduce(b: KllWrap, bytes: Array[Byte]): KllWrap = {
      if (bytes != null) b.sk.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
      b
    }
    override def merge(x: KllWrap, y: KllWrap): KllWrap = {
      x.sk.merge(y.sk)
      x
    }
    override def finish(b: KllWrap): Seq[Double] =
      if (b.sk.isEmpty) null
      else probs.map(p => b.sk.getQuantile(p, QuantileSearchCriteria.INCLUSIVE))
    override def bufferEncoder: Encoder[KllWrap] = Encoders.javaSerialization[KllWrap]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
