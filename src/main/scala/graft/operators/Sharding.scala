package graft.operators

import graft.functions.{PortableHash => PH}
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Rendezvous (highest-random-weight) shard assignment — the
    * consistent-hashing answer to "what happens when we add a shard":
    * each id goes to `argmax_s md5h60(id + ":" + s)`, so growing k → k+1
    * moves only ~1/(k+1) of the keys, where mod-hashing reshuffles
    * ~k/(k+1) of them (Thaler & Ravishankar 1998). A pure projection —
    * the argmax is a fold over k literal hash columns (k is the shard
    * count, a small constant), ties to the smaller shard id via the
    * max-struct trick. */
  def rendezvousShard(idCol: Column, numShards: Int): Column = {
    require(numShards >= 1, "need at least one shard")
    if (numShards == 1) lit(0L)
    else {
      val ranked = (0 until numShards).map { s =>
        struct(
          PH.md5Hash60(
            concat(idCol.cast("string"), lit(":"), lit(s).cast("string"))).as("h"),
          lit(-s).cast("long").as("negs"))
      }
      -greatest(ranked: _*)("negs")
    }
  }

  /** Shard-growth stability audit: fraction of ids that change shard when
    * the shard count grows `k -> k2`, under mod-hashing vs rendezvous
    * hashing — the migration-cost number that picks the sharding function
    * for a corpus that will grow. One projection + one |strategies|-row
    * aggregate; no joins, no shuffle of id rows. */
  def shardStability(
      df: DataFrame,
      idCol: String,
      k: Int,
      k2: Int): DataFrame = {
    def floorDiv(a: Column, b: Column) = ((a - pmod(a, b)) / b).cast("long")
    val id = col(idCol)
    val h = PH.md5Hash60(id)
    val assigned = df.select(
      (pmod(h, lit(k.toLong)) =!= pmod(h, lit(k2.toLong))).as("__mod_moved"),
      (rendezvousShard(id, k) =!= rendezvousShard(id, k2)).as("__rv_moved"))
    val agg = assigned.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("__mod_moved"), 1L).otherwise(0L)).as("__mod"),
      sum(when(col("__rv_moved"), 1L).otherwise(0L)).as("__rv"))
    val modRow = agg.select(lit("mod").as("strategy"), col("n_docs"),
      col("__mod").as("n_moved"))
    val rvRow = agg.select(lit("rendezvous").as("strategy"), col("n_docs"),
      col("__rv").as("n_moved"))
    modRow.unionByName(rvRow)
      .withColumn("moved_ppm",
        floorDiv(col("n_moved") * 1000000L, greatest(col("n_docs"), lit(1L))))
  }
}
