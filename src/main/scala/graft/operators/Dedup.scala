package graft.operators

import graft.functions.{SimilarityFunctions => S, TextFunctions => T}
import org.apache.spark.sql.{Column, DataFrame}
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
  *  - LSH candidate generation = explode to (bandKey, doc) then harvest each
  *    band bucket with one aggregation — shuffle is O(docs × bands), pair
  *    expansion touches only same-bucket members (empirically tiny vs n²);
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
    // Signature pipeline: shingle hashes computed in-place on the scan
    // (tokenShingleHashes hashes token tuples directly, no shingle strings),
    // exploded, then numHashes codegen'd min-aggregates — ONE shuffle (the
    // group-by on doc id) for the whole stage. No distinct pass: min over a
    // multiset equals min over the set, so duplicate shingles cost nothing
    // (a prior array_distinct here was 5x the cost of the hashing itself).
    // A window-lead relational variant benches identically at sf0.1 but
    // adds a shuffle — in-place wins at corpus scale.
    val hashed = docs.select(col(idCol).as("id"),
      explode(S.tokenShingleHashes(col(textCol), shingleSize)).as("h"))
    val minAggs = (0 until numHashes).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    val sigs = hashed.groupBy("id").agg(minAggs.head, minAggs.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
    // Candidate pairs by harvesting each band bucket in ONE aggregation —
    // groupBy(band) -> collect members -> expand in-bucket pairs — instead
    // of a band self-join. The self-join shape recomputes the (scan ->
    // shingle -> signature) subplan for each join side plus once more for a
    // bucket-size guard (Spark does not share subplans without explicit
    // persistence); this shape computes signatures once and shuffles once on
    // the band key. The skew guard becomes a plain size filter on the
    // collected bucket (boilerplate floods are dropped whole, as before);
    // per-bucket pair expansion is quadratic only within maxBucket.
    val banded = sigs
      .select(col("id"), col("sig"), explode(S.bandKeys(col("sig"), rowsPerBand)).as("band"))
    val buckets = banded.groupBy("band")
      .agg(collect_list(struct(col("id"), col("sig"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    val pairs = buckets.select(explode(flatten(
      transform(col("members"), (m, i) =>
        transform(
          slice(col("members"), i + lit(2), size(col("members")) - i - 1),
          m2 => struct(
            least(m.getField("id"), m2.getField("id")).as("id_a"),
            greatest(m.getField("id"), m2.getField("id")).as("id_b"),
            S.minhashJaccardEstimate(m.getField("sig"), m2.getField("sig"))
              .as("est_jaccard")))))).as("p"))
    pairs.select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
      col("p.est_jaccard").as("est_jaccard"))
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
    // Random-hyperplane LSH with the planes materialized as float-array
    // LITERALS (deterministic splitmix64 coefficients) and each sign bit
    // computed by the native codegen'd CosineSimilarity expression —
    // sign(cos(v, p)) == sign(dot(v, p)). The previous zip_with/aggregate
    // formulation was CodegenFallback: planeBits interpreted lambda passes
    // over every vector per row.
    val dimRow = emb.select(size(col(vecCol))).head(1)
    if (dimRow.isEmpty || dimRow(0).isNullAt(0))
      // empty (or null-vector-first) input: zero pairs, correct schema
      return emb.select(col(idCol).as("id_a"), col(idCol).as("id_b"),
        lit(0.0d).as("cos")).limit(0)
    val dim = dimRow(0).getInt(0)
    def splitmix(x0: Long): Long = {
      var z = x0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val spark = emb.sparkSession
    def plane(b: Int): Column = array((0 until dim).map { i =>
      lit(((splitmix((b.toLong << 32) | i.toLong) % 1000L) / 1000.0).toFloat)
    }: _*)
    val bucketed = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket",
        (0 until planeBits).map { b =>
          when(graft.plans.GraftExtensions.cosine(spark, col("vec"), plane(b)) > 0.0d,
            lit(1L << b)).otherwise(0L)
        }.reduce(_ + _))
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
