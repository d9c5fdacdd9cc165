package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood candidate generation — record-linkage blocking by
  * sliding a fixed window over lexicographically sorted records
  * (Hernández & Stolfo, "The Merge/Purge Problem for Large Databases",
  * SIGMOD 1995).
  *
  * Complements [[FuzzyJoin]]'s equality blocking (reference analogue: the
  * K6 fuzzy resolve family, `functions/TextLookup`): where a block key
  * must match EXACTLY, the sorted neighborhood catches near-misses that
  * merely land next to each other in sort order. Both methods share a
  * blind spot (an error early in the key moves the record far away); the
  * published fix is the same for both — several passes under DIFFERENT
  * sort keys, union-distinct the candidate pairs — exposed here as
  * [[candidatesMultiPass]].
  *
  * Scale shape: a global sorted window would put the whole corpus in one
  * window partition (the q77 anti-pattern). Instead the sort space is
  * split by a cheap block prefix of the sort key and the window slides
  * WITHIN each block: one shuffle on the block key, per-row fan-out
  * bounded by `w − 1` `lead`s, no global sort, no pair materialization
  * beyond the window. Pairs straddling a block boundary are part of the
  * multi-pass recall story (each pass re-splits the space differently),
  * not a silent loss. Pair orientation is normalized (`id_a < id_b`) so
  * passes union-distinct cleanly.
  */
object SortedNeighborhood {

  /** Candidate pairs from ONE pass: records ordered by (`sortKey`, id)
    * within `block`, each paired with its `w − 1` successors. Output:
    * `(id_a, id_b)`, `id_a < id_b`, at most `(w−1)·n` rows pre-dedup. */
  def candidates(
      df: DataFrame,
      idCol: String,
      sortKey: Column,
      block: Column,
      w: Int): DataFrame = {
    require(w >= 2, s"window must pair each record with a neighbor, got w=$w")
    require(!df.columns.exists(Set("__sn_id", "__sn_sk", "__sn_blk", "__sn_lead", "__sn_leads")),
      "input must not contain reserved internal columns __sn_*")
    val base = df
      .select(col(idCol).as("__sn_id"), sortKey.as("__sn_sk"), block.as("__sn_blk"))
      .where(col("__sn_id").isNotNull && col("__sn_sk").isNotNull &&
        col("__sn_blk").isNotNull)
    val win = Window.partitionBy("__sn_blk").orderBy(col("__sn_sk"), col("__sn_id"))
    val leads = (1 until w).map(k => lead(col("__sn_id"), k).over(win))
    base
      .withColumn("__sn_leads", array(leads: _*))
      .select(col("__sn_id"), explode(col("__sn_leads")).as("__sn_lead"))
      .where(col("__sn_lead").isNotNull)
      .select(
        least(col("__sn_id"), col("__sn_lead")).as("id_a"),
        greatest(col("__sn_id"), col("__sn_lead")).as("id_b"))
  }

  /** Union-distinct candidates of several `(sortKey, block)` passes — the
    * multi-pass SNM of the paper (§4.2): each pass has bounded recall, the
    * union approaches the transcription-error closure. */
  def candidatesMultiPass(
      df: DataFrame,
      idCol: String,
      passes: Seq[(Column, Column)],
      w: Int): DataFrame = {
    require(passes.nonEmpty, "at least one (sortKey, block) pass required")
    passes.map { case (sk, blk) => candidates(df, idCol, sk, blk, w) }
      .reduce(_ unionByName _)
      .distinct()
  }

  /** Score candidate pairs with normalized Levenshtein similarity over
    * `nameCol` (the [[FuzzyJoin]] score, q44/q105 precedent) and keep
    * pairs at `threshold` or better. `entities` joins in at the pair
    * grain twice — broadcast when dimension-sized, shuffle otherwise.
    * Output: `(id_a, id_b, score)`. */
  def scoredPairs(
      pairs: DataFrame,
      entities: DataFrame,
      idCol: String,
      nameCol: String,
      threshold: Double): DataFrame = {
    val ents = entities.select(col(idCol).as("__sn_eid"), col(nameCol).as("__sn_nm"))
      .where(col("__sn_eid").isNotNull && col("__sn_nm").isNotNull)
    pairs
      .join(ents.select(col("__sn_eid"), col("__sn_nm").as("__sn_na")),
        col("id_a") === col("__sn_eid")).drop("__sn_eid")
      .join(ents.select(col("__sn_eid"), col("__sn_nm").as("__sn_nb")),
        col("id_b") === col("__sn_eid")).drop("__sn_eid")
      .withColumn("score",
        lit(1.0) - levenshtein(lower(col("__sn_na")), lower(col("__sn_nb"))).cast("double") /
          greatest(length(col("__sn_na")), length(col("__sn_nb"))).cast("double"))
      .where(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }
}
