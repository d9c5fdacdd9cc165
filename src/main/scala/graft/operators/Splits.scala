package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/val/test assignment — the split that must NEVER
  * move a document between splits when the corpus grows (eval contamination
  * by reassignment is invisible and catastrophic: yesterday's train doc in
  * today's test set).
  *
  * Assignment is a pure function of the document id: the portable md5-60
  * hash of `salt || id` reduced to a parts-per-million bucket, compared
  * against integer ppm thresholds (the [[Mixing]] idiom — no float
  * fractions, no engine-specific rounding, replayable in any engine with
  * md5). Zero shuffles: the split column is a per-row projection; stability
  * under corpus growth holds because nothing about other rows enters the
  * hash. The salt isolates split families (changing the salt is a fresh
  * independent split; reusing a salt reproduces the old one exactly).
  */
object Splits {

  /** ppm denominator: buckets are `pmod(hash, 1e6)`. */
  val Ppm: Long = 1000000L

  /** Assign each row a named split. `splits` are (name, ppm) pairs that
    * must sum to exactly 1,000,000 — integer ppm, not float fractions, so
    * the thresholds are the same in every engine. Appends `bucket` (the
    * row's ppm draw) and `split`. */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Long)],
      salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "positive ppm shares")
    require(splits.map(_._2).sum == Ppm,
      s"ppm shares must sum to $Ppm, got ${splits.map(_._2).sum}")
    require(!df.columns.contains("bucket") && !df.columns.contains("split"),
      "input must not already contain bucket/split")
    val bucket = pmod(
      PortableHash.md5Hash60(concat(lit(salt), lit(":"), col(idCol).cast("string"))),
      lit(Ppm))
    val cuts = splits.scanLeft(0L)(_ + _._2).tail // cumulative upper bounds
    val assign = splits.zip(cuts).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), hi)) =>
        coalesce(acc, when(col("bucket") < hi, lit(name)))
    }
    df.withColumn("bucket", bucket).withColumn("split", assign)
  }

  /** The same bucket expression as a DuckDB SQL fragment, for oracles.
    * Plain `%` suffices: the md5-60 hash is non-negative by construction,
    * so sign-following and positive modulo agree. */
  def bucketSql(idExpr: String, salt: String = "split"): String =
    s"(${PortableHash.md5Hash60Sql(s"'$salt:' || CAST($idExpr AS VARCHAR)")} % ${Ppm})"

  /** Group-aware (leakage-safe) split + audit: assignment hashes the GROUP
    * key (`groupCol`) instead of the row id, so every row of a group —
    * every page of a domain, every doc of an author — lands in the SAME
    * split. That is the standard defense against train/test leakage
    * through correlated near-duplicates (a domain's boilerplate in train
    * AND test evaluates memorization, not generalization), and it is also
    * why achieved row shares DRIFT from the requested ppm: groups are
    * chunky, and one hot group drags its whole row mass into one split.
    *
    * This returns the AUDIT at the split grain, because the drift is the
    * thing a pipeline must alarm on (the assignment itself is
    * [[hashSplit]] with `idCol = groupCol`):
    * `(split, n_groups, n_rows, rows_ppm_target, rows_ppm_achieved)` —
    * integer ppm both sides, engine-exact.
    *
    * Scale shape: assignment stays a per-row projection (zero shuffles);
    * the audit aggregates rows to the GROUP grain (one map-side-combined
    * shuffle) and groups to the split grain (tiny). The total row count
    * rides a 1-row crossJoin (A8 lazy-scalar idiom), never a collect. */
  def groupSplitAudit(
      df: DataFrame,
      groupCol: String,
      splits: Seq[(String, Long)],
      salt: String = "split"): DataFrame = {
    val assigned = hashSplit(df, groupCol, splits, salt)
    val groups = assigned.groupBy(col("split"), col(groupCol))
      .agg(count(lit(1)).as("__rows"))
    val total = groups.agg(sum(col("__rows")).as("__total"))
    val targets = splits.foldLeft(lit(null).cast("long")) {
      case (acc, (name, ppm)) =>
        coalesce(acc, when(col("split") === name, lit(ppm)))
    }
    groups
      .groupBy("split")
      .agg(count(lit(1)).as("n_groups"), sum(col("__rows")).as("n_rows"))
      .crossJoin(total)
      .select(col("split"), col("n_groups"), col("n_rows"),
        targets.as("rows_ppm_target"),
        // explicit floor: a bare double->long CAST truncates in Spark but
        // ROUNDS in DuckDB; floor agrees everywhere
        floor(col("n_rows") * lit(Ppm) / col("__total")).cast("long")
          .as("rows_ppm_achieved"))
  }

  /** Near-dup straddle audit at BOTH split grains — the reference check
    * that group-keyed hashing ([[groupSplitAudit]]) actually removes the
    * train/heldout leakage a row-keyed split leaves behind (q231's
    * measurement). A near-dup pair "straddles" when its two documents land
    * on opposite sides of the train/heldout cut; under the GROUP law a
    * same-group pair can NEVER straddle (both sides hash the same group
    * key), so group-law leakage is bounded by the cross-group pair count —
    * `n_same_group` is reported so the mechanism is visible in the output.
    *
    * One row per law: `(split_law ∈ {doc_hash, group_hash}, n_pairs,
    * n_same_group, n_cross, leak_ppm, n_held_docs_leaked, n_held_docs,
    * exposure_ppm)` — "held" = bucket ≥ `trainPpm` under that law's key,
    * rates integer floor-ppm, the whole readout engine-exact.
    *
    * Scale shape: the pair table is the capped LSH harvest (tiny relative
    * to the corpus); both group lookups are joins OF THE PAIRS against the
    * `(id, group)` projection (shuffle-on-id — the doc table is never
    * assumed broadcastable), both laws' labels are projections over ONE
    * materialized labeled pair table, and the per-law rollups are tiny
    * aggregates. */
  def pairSplitLeakage(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      trainPpm: Long = 800000L,
      salt: String = "split"): DataFrame = {
    require(trainPpm > 0 && trainPpm < Ppm, s"trainPpm must be in (0, $Ppm)")
    def bucket(c: Column): Column =
      pmod(PortableHash.md5Hash60(concat(lit(salt), lit(":"), c.cast("string"))),
        lit(Ppm))
    val d = docs.select(col(idCol).as("__id"), col(groupCol).as("__grp"))
    // label once, aggregate twice (per law): materialize the labeled pair
    // table — it is flood-capped-small and double-consumed
    val lab = pairs.select(col("id_a"), col("id_b"))
      .join(d.select(col("__id").as("id_a"), col("__grp").as("ga")), "id_a")
      .join(d.select(col("__id").as("id_b"), col("__grp").as("gb")), "id_b")
      .select(col("id_a"), col("id_b"), col("ga"), col("gb"),
        (bucket(col("id_a")) < trainPpm).as("ta_doc"),
        (bucket(col("id_b")) < trainPpm).as("tb_doc"),
        (bucket(col("ga")) < trainPpm).as("ta_grp"),
        (bucket(col("gb")) < trainPpm).as("tb_grp"))
      .localCheckpoint()
    // floor-ppm via subtract-the-remainder: the divided value is an exact
    // multiple of the denominator, so the double division is exact (the
    // q231 idiom — a bare floor(long/long) rides a double quotient that
    // can sit 1 ulp under an integer)
    def ppm(n: Column, den: Column): Column =
      when(den > 0L,
        ((n * lit(Ppm) - pmod(n * lit(Ppm), den)) / den).cast("long"))
        .otherwise(lit(0L))
    def lawRow(law: String, ta: String, tb: String, heldKey: Column): DataFrame = {
      val ag = lab.agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("ga") === col("gb"), lit(1L)).otherwise(lit(0L)))
          .as("n_same_group"),
        sum(when(col(ta) =!= col(tb), lit(1L)).otherwise(lit(0L))).as("n_cross"))
      val leaked = lab.where(col(ta) =!= col(tb))
        .select(when(col(ta), col("id_b")).otherwise(col("id_a")).as("h"))
        .agg(count_distinct(col("h")).as("n_held_docs_leaked"))
      val heldTotal = docs
        .where(bucket(heldKey) >= trainPpm)
        .agg(count(lit(1)).as("n_held_docs"))
      ag.crossJoin(leaked).crossJoin(heldTotal)
        .select(lit(law).as("split_law"),
          col("n_pairs"), col("n_same_group"), col("n_cross"),
          ppm(col("n_cross"), col("n_pairs")).as("leak_ppm"),
          col("n_held_docs_leaked"), col("n_held_docs"),
          ppm(col("n_held_docs_leaked"), col("n_held_docs")).as("exposure_ppm"))
    }
    lawRow("doc_hash", "ta_doc", "tb_doc", col(idCol))
      .unionByName(lawRow("group_hash", "ta_grp", "tb_grp", col(groupCol)))
  }
}
