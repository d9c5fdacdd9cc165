package graft.operators

import graft.functions.{SimilarityFunctions => S, TextFunctions => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operator family for training-data pipelines: exact
  * (fingerprint hash), MinHash+LSH near-dup, SimHash near-dup, and n-gram
  * Jaccard verification — each designed so the only shuffles are on hash /
  * band keys (never an all-pairs cross join).
  *
  * Reference analogue: url_hash dedup on ingest
  * (`src/ingest_v2.py:195-222`, `src/url_utils.py:43-47`) — generalize from
  * "same canonical URL" to "same/near-same content" at corpus scale.
  *
  * 100 TB posture:
  *  - exact dedup = one hash-aggregate shuffle on the 128-bit fingerprint;
  *  - LSH candidate generation = explode to (bandKey, doc) then self-join on
  *    bandKey — shuffle is O(docs × bands), candidate verification touches
  *    only same-bucket pairs (empirically tiny vs n²);
  *  - band-key hot buckets (boilerplate docs) are the skew risk: cap bucket
  *    size before pairing (`maxBucket`), mirroring production LSH dedup
  *    pipelines, and/or rely on AQE skew-join splitting.
  */
object Dedup {

  /** Exact-duplicate groups by content fingerprint: one row per distinct
    * fingerprint with the group size and the keeper (minimum id). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("fp", T.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** MinHash-LSH near-duplicate candidate pairs with estimated Jaccard.
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b, deduplicated across
    * bands. Only pairs sharing >=1 LSH band collide; the estimate comes from
    * full-signature agreement.
    */
  def minhashCandidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      rowsPerBand: Int = 4,
      maxBucket: Int = 1000): DataFrame = {
    // Signature via relational explode + numHashes codegen'd min-aggregates,
    // NOT a higher-order aggregate expression: HOF lambdas are
    // CodegenFallback (interpreted) and get re-evaluated wherever the column
    // is referenced. Each shingle is string-hashed ONCE; the hash family is
    // derived by re-hashing the 64-bit value with the seed (cheap long
    // mixing, no string re-scan). One shuffle on the doc id, map-side
    // partial min — the scalable shape at corpus size.
    val hashed = docs.select(col(idCol).as("id"),
      explode(array_distinct(S.tokenShingleHashes(col(textCol), shingleSize))).as("h"))
    val minAggs = (0 until numHashes).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    val sigs = hashed.groupBy("id").agg(minAggs.head, minAggs.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
    val banded = sigs
      .select(col("id"), col("sig"), explode(S.bandKeys(col("sig"), rowsPerBand)).as("band"))
    // skew guard: drop pathological buckets (boilerplate floods) before pairing
    val bucketSizes = banded.groupBy("band").agg(count(lit(1)).as("bsz"))
    val bounded = banded.join(bucketSizes.filter(col("bsz") <= maxBucket), Seq("band"))
    val a = bounded.select(col("band"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = bounded.select(col("band"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        S.minhashJaccardEstimate(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .distinct()
  }

  /** Exact n-gram Jaccard for given candidate pairs (verification pass after
    * LSH): joins shingle sets back and computes true Jaccard. */
  def verifyJaccard(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3): DataFrame = {
    val sets = docs.select(col(idCol).as("id"),
      array_distinct(S.tokenShingles(col(textCol), shingleSize)).as("sh"))
    pairs
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"), S.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
  }

  /** SimHash table: per-doc 64-bit simhash plus a 16-bit prefix bucket —
    * near-dups (small Hamming distance) mostly share prefix buckets; pairing
    * within buckets is the scale path (4 rotated prefix tables catch all
    * pairs within Hamming distance 3 — standard simhash sharding).
    *
    * Relational formulation (explode tokens -> 64 codegen'd conditional-sum
    * aggregates -> bit reassembly) rather than a higher-order expression:
    * HOF lambdas are interpreted and were ~5x slower at bench scale. One
    * shuffle on the doc id with map-side partial aggregation. */
  def simhashTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("tok"))
    val hashed = toks.select(col("id"), xxhash64(col("tok")).as("h"))
    val balances = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"b$i")
    }
    hashed.groupBy("id").agg(balances.head, balances.tail: _*)
      .select(col("id"),
        (0 until 64).map(i =>
          when(col(s"b$i") > 0L, lit(1L << i)).otherwise(0L)).reduce(_ bitwiseOR _)
          .as("simhash"))
      .withColumn("bucket16", shiftrightunsigned(col("simhash"), 48))
  }

  /** Embedding near-dup pairs: cosine >= threshold among vectors sharing a
    * coarse LSH bucket (random-hyperplane sign bits from fixed seeds). */
  def embeddingNearDupPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      planeBits: Int = 8): DataFrame = {
    // random-hyperplane LSH without a literal plane matrix: use xxhash64 of
    // (seed, index) as deterministic pseudo-random plane coefficients.
    val sign = (bit: Int) => {
      val prods = expr(
        s"""aggregate(zip_with(vec, sequence(0, size(vec)-1),
           |  (v, i) -> v * (cast(xxhash64($bit, i) % 1000 as double) / 1000.0)),
           |  0.0d, (acc, x) -> acc + x)""".stripMargin)
      when(prods > 0.0d, 1L).otherwise(0L)
    }
    val bucketed = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket",
        (0 until planeBits).map(b => sign(b) * (1L << b)).reduce(_ + _))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.plans.GraftExtensions.cosine(emb.sparkSession, col("vec_a"), col("vec_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
  }
}
