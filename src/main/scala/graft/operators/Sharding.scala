package graft.operators

import graft.functions.{PortableHash => PH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic epoch shuffling + sharded export — the training-loader
  * handoff of a data pipeline: each epoch must see the corpus in a fresh
  * pseudorandom order, split into a fixed number of shard files, and the
  * result must be BYTE-IDENTICAL across reruns, cluster sizes, and engines
  * (no `rand()`, no partition-order dependence).
  *
  * The permutation is the portable content hash of `"epoch:id"`
  * ([[graft.functions.PortableHash.md5Hash60]]) — seedless, replayable in
  * SQL oracles, and a different stream every epoch. Shard = hash mod
  * `numShards`, so epoch N+1 re-deals every document to a new shard AND a
  * new position: inter-shard order correlation between epochs is that of
  * independent hashes.
  *
  * 100 TB posture: assignment is a pure projection on the scan (no
  * Exchange); the only shuffle is the repartition to shards, which IS the
  * output layout. Within-shard position comes from a per-shard sort, so
  * parallelism = numShards — size shards so corpus/numShards fits an
  * output task (the usual ~1 GiB shard-file target), never a global sort.
  */
object Sharding {

  /** Adds `(shard, shard_pos)` to `df`: shard = md5h60("epoch:id") mod
    * `numShards`; shard_pos = 1-based rank of that hash (ties by id)
    * within the shard. The id column must be distinct per row for the
    * position to be a true permutation. */
  def assignShards(df: DataFrame, idCol: String, epoch: Int, numShards: Int): DataFrame = {
    require(!df.columns.contains("__k"), "column name __k is reserved")
    val k = PH.md5Hash60(
      concat(lit(epoch.toString), lit(":"), col(idCol).cast("string")))
    df.withColumn("__k", k)
      .withColumn("shard", pmod(col("__k"), lit(numShards.toLong)).cast("int"))
      .withColumn("shard_pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("__k"), col(idCol))).cast("long"))
      .drop("__k")
  }

  /** Writes one directory per shard (`shard=N/`), rows inside each shard
    * parquet-ordered by `shard_pos` — a deterministic training-ready
    * layout. One Exchange (the shard repartition), one in-partition sort. */
  def writeShards(
      df: DataFrame,
      idCol: String,
      epoch: Int,
      numShards: Int,
      outDir: String): Unit =
    assignShards(df, idCol, epoch, numShards)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
}
