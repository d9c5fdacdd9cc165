package graft.operators

import java.io.ByteArrayOutputStream

import graft.functions.PortableHash
import graft.plans.GraftExtensions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Bloom-filter join pruning — the semi-join reduction that matters at
  * 100 TB.
  *
  * A fact⨝dim semi join normally shuffles the WHOLE fact table on the join
  * key even when only a small fraction of fact rows survive. When the dim
  * key SET fits in a bloom filter (a few MB for tens of millions of keys at
  * 1% fpp — far past broadcast-join comfort for the dim ROWS themselves),
  * the filter can run inside the fact scan, before the exchange: rows whose
  * key cannot be in the dim side never leave the scan stage. The residual
  * false positives (≤ fpp of the pruned stream) are removed by the exact
  * semi join that follows, so the operator's RESULT is bit-identical to the
  * plain semi join — only the shuffled volume changes.
  *
  * This is the same mechanism as Spark's AQE runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), made explicit and
  * available to any pipeline stage (including non-join uses: probing an
  * incremental store, decontamination vocabularies, …). The probe is the
  * native codegen [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
  * expression — no UDF, stays inside whole-stage codegen; the build side is
  * a distributed `stat.bloomFilter` aggregation (treeAggregate), and only
  * the filter BYTES make a driver roundtrip (bounded metadata, same class
  * as the k-means centroid collect in [[Similarity]]).
  *
  * Key normalization: the sketch put/probe paths are long-keyed
  * (`putLong`/`mightContainLong`), so integral keys are cast to long and
  * string keys are hashed through the portable
  * [[graft.functions.PortableHash.md5Hash60]] on BOTH sides. The exact
  * semi join always runs on the ORIGINAL key column — hashing only gates
  * the probe, so a (vanishingly unlikely) 60-bit collision costs one extra
  * shuffled row, never a wrong result.
  */
object BloomPrune {

  /** Internal key name; fail fast if the caller already uses it (repo-wide
    * reserved-internal-column contract). */
  private val Reserved = "__bp_k"

  /** Distributed build of the dim-side key bloom filter; returns the
    * serialized sketch (driver-held, broadcast implicitly as a literal
    * reference in the probe expression). Null keys are excluded — a null
    * never equi-joins. */
  def buildFilter(
      dim: DataFrame,
      dimKey: Column,
      expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val keys = dim.select(normalize(dim, dimKey).as(Reserved))
      .where(col(Reserved).isNotNull)
    // Spark's stat.bloomFilter NPEs on an empty build side (the underlying
    // aggregate yields null bytes) — an empty dim means an empty-set filter
    val filter =
      if (keys.isEmpty)
        org.apache.spark.util.sketch.BloomFilter.create(math.max(1L, expectedItems), fpp)
      else keys.stat.bloomFilter(Reserved, math.max(1L, expectedItems), fpp)
    val bos = new ByteArrayOutputStream()
    filter.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen probe: true iff `key` might be in the serialized filter.
    * Null key → null → rows drop under a WHERE, matching equi-join
    * null semantics. */
  def mightContain(df: DataFrame, filterBytes: Array[Byte], key: Column): Column = {
    GraftExtensions.ensureRegistered(df.sparkSession)
    call_function("graft_bloom_might_contain", lit(filterBytes), normalize(df, key))
  }

  /** `fact LEFT SEMI JOIN dim` with the fact side bloom-pruned BEFORE the
    * join exchange. Result is exactly the plain semi join at any fpp. */
  def semiJoin(
      fact: DataFrame,
      factKey: Column,
      dim: DataFrame,
      dimKey: Column,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    require(!fact.columns.contains(Reserved),
      s"fact must not contain reserved internal column $Reserved")
    val bytes = buildFilter(dim, dimKey, expectedItems, fpp)
    val pruned = fact.where(mightContain(fact, bytes, factKey))
    val dimKeys = dim.select(dimKey.as(Reserved)).where(col(Reserved).isNotNull)
    pruned
      .join(dimKeys, factKey === col(Reserved), "left_semi")
  }

  /** Long-keyed view of a key column: integral → long cast; string →
    * portable md5-60 hash. The SAME normalization runs on build and probe
    * side, so the sketch's long-keyed put/probe paths always agree. The
    * type is resolved by analyzing a 0-row projection against the owning
    * frame (an unresolved Column carries no dataType of its own). */
  private def normalize(owner: DataFrame, key: Column): Column =
    owner.select(key).schema.head.dataType match {
      case StringType => PortableHash.md5Hash60(key)
      case _ => key.cast("long")
    }
}
