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

  /** [[pairSplitLeakage]] computed at the GROUP grain — for pair sets that
    * are the EXPANSION of an exact-duplicate group structure (the
    * [[Dedup.dualHashPairGraph]] decomposition): a group of n members
    * contributes all n·(n−1)/2 within pairs, a verified rep pair (A, B)
    * contributes all |A|·|B| cross pairs, and `rawPairs` are explicit
    * edges. The expanded pair set is Σ group² rows — quadratic in
    * exact-copy count, the dominant mass on dup-heavy corpora — but every
    * aggregate this audit reports is reconstructible from per-group
    * counts:
    *
    *  - pair counts are n·(n−1)/2 / |A|·|B| arithmetic;
    *  - straddle counts are products of per-side train/held counts
    *    (within a group: k_t·(n−k_t); across a rep pair:
    *    ka_t·(nb−kb_t) + (na−ka_t)·kb_t — every member pairs with every
    *    opposite member, so the count factorizes);
    *  - a held member is LEAKED iff its own group has a train member or
    *    some rep-pair-neighbor group does (it pairs with all of them), so
    *    the distinct-leaked set explodes each group at most ONCE (linear
    *    in membership, never the quadratic pair mass).
    *
    * CONTRACT (what makes the reconstruction exact, differentially pinned
    * in SplitsSpec): every member of a group, and both sides of a rep
    * pair, carry the SAME `groupCol` value in `docs` — true by
    * construction when `groupCol` is the connected component of the very
    * pair graph `members`/`repPairs` define (the q239 manifest). Output is
    * bit-identical to `pairSplitLeakage(expandedPairs, docs, ...)`. */
  def groupedPairSplitLeakage(
      members: DataFrame,  // (id, rep) — every id's exact-group representative
      repPairs: DataFrame, // (id_a, id_b) at rep grain — verified cross-group pairs
      rawPairs: DataFrame, // (id_a, id_b) — explicit pairs, no expansion semantics
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
    // member grain: one row per id with its group value and both laws'
    // train flags — linear in membership, consumed by the stats aggregate
    // and the leaked-member readout (lazy checkpoint: first action caches)
    val mem = members.select(col("id"), col("rep"))
      .join(d.select(col("__id").as("id"), col("__grp").as("g")), "id")
      .select(col("id"), col("rep"), col("g"),
        (bucket(col("id")) < trainPpm).as("td"),
        (bucket(col("g")) < trainPpm).as("tg"))
      .localCheckpoint(false)
    // group grain: size + per-law train-member counts (tg/g constant per
    // group under the contract; max is the homogeneous read)
    // EAGER: five downstream consumers (clique aggregate, both biclique
    // sides, neighbor flags, leak flags) would otherwise race concurrent
    // stages into recomputing the membership aggregate; the one job here
    // also materializes `mem` for the leaked-member readout
    val gstats = mem.groupBy("rep").agg(
        count(lit(1)).as("n"),
        sum(when(col("td"), lit(1L)).otherwise(lit(0L))).as("ktd"),
        max(col("tg")).as("tg"),
        max(col("g")).as("g"))
      .withColumn("ktg", when(col("tg"), col("n")).otherwise(lit(0L)))
      .localCheckpoint()
    // within-group (clique) contributions: n·(n−1) is even, the halved
    // double is integer-exact
    val cliqueAgg = gstats.agg(
      coalesce(sum((col("n") * (col("n") - 1L)) / lit(2.0)).cast("long"), lit(0L))
        .as("c_pairs"),
      coalesce(sum(col("ktd") * (col("n") - col("ktd"))), lit(0L)).as("c_cross_d"),
      coalesce(sum(col("ktg") * (col("n") - col("ktg"))), lit(0L)).as("c_cross_g"))
    // cross-group (biclique) contributions, one row per rep pair
    def side(k: String, suf: String) = gstats.select(
      col("rep").as(k), col("n").as(s"n$suf"), col("ktd").as(s"ktd$suf"),
      col("ktg").as(s"ktg$suf"), col("g").as(s"g$suf"))
    val bi = repPairs.select(col("id_a"), col("id_b"))
      .join(side("id_a", "a"), "id_a")
      .join(side("id_b", "b"), "id_b")
    val biAgg = bi.agg(
      coalesce(sum(col("na") * col("nb")), lit(0L)).as("b_pairs"),
      coalesce(sum(when(col("ga") === col("gb"), col("na") * col("nb"))
        .otherwise(lit(0L))), lit(0L)).as("b_same"),
      coalesce(sum(col("ktda") * (col("nb") - col("ktdb"))
        + (col("na") - col("ktda")) * col("ktdb")), lit(0L)).as("b_cross_d"),
      coalesce(sum(col("ktga") * (col("nb") - col("ktgb"))
        + (col("na") - col("ktga")) * col("ktgb")), lit(0L)).as("b_cross_g"))
    // raw pairs: the generic per-pair labeling (linear, no expansion)
    val lab = rawPairs.select(col("id_a"), col("id_b"))
      .join(d.select(col("__id").as("id_a"), col("__grp").as("ga")), "id_a")
      .join(d.select(col("__id").as("id_b"), col("__grp").as("gb")), "id_b")
      .select(col("id_a"), col("id_b"), col("ga"), col("gb"),
        (bucket(col("id_a")) < trainPpm).as("tad"),
        (bucket(col("id_b")) < trainPpm).as("tbd"),
        (bucket(col("ga")) < trainPpm).as("tag"),
        (bucket(col("gb")) < trainPpm).as("tbg"))
      .localCheckpoint() // eager: double-consumed (aggregate + leaked readout)
    val rawAgg = lab.agg(
      count(lit(1)).as("r_pairs"),
      coalesce(sum(when(col("ga") === col("gb"), 1L).otherwise(0L)), lit(0L))
        .as("r_same"),
      coalesce(sum(when(col("tad") =!= col("tbd"), 1L).otherwise(0L)), lit(0L))
        .as("r_cross_d"),
      coalesce(sum(when(col("tag") =!= col("tbg"), 1L).otherwise(0L)), lit(0L))
        .as("r_cross_g"))
    // leaked held members: own group or a rep-pair neighbor has a train
    // member under the law — each group read ONCE, never per pair
    val nbrFlags = repPairs.select(explode(array(
        struct(col("id_a").as("rep"), col("id_b").as("nb")),
        struct(col("id_b").as("rep"), col("id_a").as("nb")))).as("e"))
      .select(col("e.rep").as("rep"), col("e.nb").as("nb"))
      .join(gstats.select(col("rep").as("nb"), col("ktd").as("nktd"),
        col("ktg").as("nktg")), "nb")
      .groupBy("rep")
      .agg(max(col("nktd") >= 1L).as("nbr_td"), max(col("nktg") >= 1L).as("nbr_tg"))
    val gFlags = gstats
      .join(nbrFlags, Seq("rep"), "left")
      .select(col("rep"),
        (col("ktd") >= 1L || coalesce(col("nbr_td"), lit(false))).as("leak_d"),
        (col("ktg") >= 1L || coalesce(col("nbr_tg"), lit(false))).as("leak_g"))
    def leakedGroups(memberHeld: Column, flag: String) =
      mem.join(gFlags, "rep")
        .where(!memberHeld && col(flag))
        .select(col("id").as("h"))
    def leakedRaw(ta: String, tb: String) =
      lab.where(col(ta) =!= col(tb))
        .select(when(col(ta), col("id_b")).otherwise(col("id_a")).as("h"))
    val leakedD = leakedGroups(col("td"), "leak_d")
      .unionByName(leakedRaw("tad", "tbd"))
      .agg(count_distinct(col("h")).as("leaked_d"))
    val leakedG = leakedGroups(col("tg"), "leak_g")
      .unionByName(leakedRaw("tag", "tbg"))
      .agg(count_distinct(col("h")).as("leaked_g"))
    val heldD = docs.where(bucket(col(idCol)) >= trainPpm)
      .agg(count(lit(1)).as("held_d"))
    val heldG = docs.where(bucket(col(groupCol)) >= trainPpm)
      .agg(count(lit(1)).as("held_g"))
    // floor-ppm via subtract-the-remainder (the q231 idiom — see
    // pairSplitLeakage)
    def ppm(n: Column, den: Column): Column =
      when(den > 0L,
        ((n * lit(Ppm) - pmod(n * lit(Ppm), den)) / den).cast("long"))
        .otherwise(lit(0L))
    val all = cliqueAgg.crossJoin(biAgg).crossJoin(rawAgg)
      .crossJoin(leakedD).crossJoin(leakedG)
      .crossJoin(heldD).crossJoin(heldG)
      .select(
        (col("c_pairs") + col("b_pairs") + col("r_pairs")).as("n_pairs"),
        (col("c_pairs") + col("b_same") + col("r_same")).as("n_same_group"),
        (col("c_cross_d") + col("b_cross_d") + col("r_cross_d")).as("cross_d"),
        (col("c_cross_g") + col("b_cross_g") + col("r_cross_g")).as("cross_g"),
        col("leaked_d"), col("leaked_g"), col("held_d"), col("held_g"))
      // eager: BOTH law rows read this 1-row frame — lazy would let the
      // two final stages race into re-running every aggregate (including
      // the two full held-count scans of `docs`) once per law
      .localCheckpoint()
    def lawRow(law: String, crossC: String, leakedC: String, heldC: String) =
      all.select(lit(law).as("split_law"),
        col("n_pairs"), col("n_same_group"), col(crossC).as("n_cross"),
        ppm(col(crossC), col("n_pairs")).as("leak_ppm"),
        col(leakedC).as("n_held_docs_leaked"), col(heldC).as("n_held_docs"),
        ppm(col(leakedC), col(heldC)).as("exposure_ppm"))
    lawRow("doc_hash", "cross_d", "leaked_d", "held_d")
      .unionByName(lawRow("group_hash", "cross_g", "leaked_g", "held_g"))
  }
}
