package graft.operators

import graft.functions.{SimilarityFunctions => S}
import graft.plans.GraftExtensions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — query set broadcast against the
  * corpus, ranked per query with a window. This is the exact answer and the
  * right plan whenever |queries| is small (the broadcast side) regardless of
  * corpus size: the corpus is scanned once, no shuffle of corpus vectors,
  * and only |queries| × k rows survive the rank filter.
  *
  * Scale path: IVF-style coarse quantization — assign every corpus vector to
  * its nearest of `nlist` centroid buckets once (write-time), probe only
  * `nprobe` buckets per query. Here centroids are derived deterministically
  * from sampled corpus vectors (no external KMeans dependency), which keeps
  * the plumbing (bucketing, probe-join, rank) identical to a trained index.
  */
object Similarity {

  /** Exact brute-force cosine top-k neighbors for each query vector.
    * Output: (query_id, neighbor_id, cos, rank), rank 1..k, self excluded.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        GraftExtensions.cosine(corpus.sparkSession, col("qvec"), col("cvec")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Truncated-dimension recall ablation (the Matryoshka-representation
    * evaluation, Kusupati et al. 2022): for each probe, how much of the
    * FULL-dimension exact top-k survives when vectors are truncated to
    * their first `d` components — the measurement that decides how far an
    * embedding column can be cheapened (storage, ANN cost scale linearly
    * in d) before retrieval quality pays.
    *
    * Per dim: one brute-force pass over prefix-sliced vectors (the slice
    * is a projection that narrows every row BEFORE the scan's shuffle-free
    * broadcast-probe join), then an inner join of the two query-grain
    * top-k lists counts survivors. `recall = n_overlap / k` is one IEEE
    * division of small ints — engine-exact; membership itself is exact
    * because both rank chains tie-break on (cos desc, neighbor id).
    *
    * Returns `(query_id, dim, n_overlap, recall)` — one row per
    * (probe, truncation dim). */
  def truncationRecall(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Seq[Int],
      k: Int): DataFrame = {
    require(dims.nonEmpty && dims.forall(_ >= 1), "dims must be positive")
    val full = bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    dims.map { d =>
      val tc = corpus.select(col(idCol),
        slice(col(vecCol), 1, d).as(vecCol))
      val tq = queries.select(col(idCol),
        slice(col(vecCol), 1, d).as(vecCol))
      val trunc = bruteForceTopK(tc, tq, idCol, vecCol, k)
        .select(col("query_id"), col("neighbor_id"))
      // left join: a probe whose truncated list shares NOTHING with the
      // full list must still report n_overlap = 0, not vanish
      full.join(trunc.withColumn("__hit", lit(1L)),
        Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_overlap"))
        .select(col("query_id"), lit(d).as("dim"), col("n_overlap"),
          (col("n_overlap").cast("double") / k).as("recall"))
    }.reduce(_ unionByName _)
  }

  /** Deterministic ±1 Johnson–Lindenstrauss sign matrix (Achlioptas 2003's
    * database-friendly projection, the ±1 case): `outDims` rows of
    * `inDims` signs drawn from the splitmix64 stream — the same literals
    * every run and every engine, so a generated oracle can inline them. */
  def jlSigns(outDims: Int, inDims: Int): Seq[Seq[Int]] =
    (0 until outDims).map { j =>
      (0 until inDims).map { d =>
        if (((graft.functions.PortableHash.splitmix(
          j.toLong * 8191L + d.toLong) >>> 17) & 1L) == 1L) 1 else -1
      }
    }

  /** Signed random projection of an integer-valued vector column (e.g.
    * [[quantizeInt8]]'s `qvec`) onto `signs.length` dimensions: out_j =
    * Σ_d signs(j)(d)·v(d). Every product and partial sum is an integer
    * with |out_j| ≤ inDims·max|v| — exactly representable in double, so
    * the result is summation-order-independent and engine-exact (no float
    * parity hazard anywhere in the projection). Output keeps the `qvec`
    * name so the quantized top-k kernels run on it unchanged.
    *
    * Scale shape: a narrow per-row projection on the scan — no shuffle,
    * no state; the matrix rides along as plan literals. */
  def signedProjection(
      df: DataFrame, idCol: String, vecCol: String,
      signs: Seq[Seq[Int]]): DataFrame = {
    require(signs.nonEmpty && signs.map(_.length).distinct.size == 1,
      "signs must be a non-empty rectangular matrix")
    val projected = signs.map { row =>
      aggregate(
        zip_with(col(vecCol), lit(row.toArray),
          (x, sgn) => x.cast("double") * sgn.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    }
    df.select(col(idCol), array(projected: _*).as("qvec"))
  }

  /** Index-build step: the first `nlist` corpus vectors in id order as
    * stand-in centroids. ONE tiny driver action (limit-pushed scan of nlist
    * rows) at index-build time — never per query. Prefer
    * [[trainCentroidsKMeans]] for real data distributions. */
  def headCentroids(
      corpus: DataFrame, idCol: String, vecCol: String, nlist: Int): Seq[(Int, Seq[Float])] =
    corpus.orderBy(col(idCol)).limit(nlist).select(col(vecCol)).collect()
      .toSeq.zipWithIndex.map { case (r, i) => (i, r.getSeq[Float](0)) }

  /** Index-build step: Lloyd k-means over the corpus, initialized from
    * [[headCentroids]]. Each iteration is ONE distributed pass: shuffle-free
    * argmax assignment against centroid literals (same kernel as
    * [[ivfTopK]]'s write path), then a per-bucket mean aggregation whose
    * result (nlist rows) is collected — the only driver data per iteration.
    * Empty clusters keep their previous centroid. Deterministic given the
    * corpus: no random init, ties broken by centroid id. */
  def trainCentroidsKMeans(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      iters: Int = 5): Seq[(Int, Seq[Float])] = {
    val spark = corpus.sparkSession
    var cents = headCentroids(corpus, idCol, vecCol, nlist)
    val dim = cents.head._2.length
    for (_ <- 0 until iters) {
      val assigned = corpus.select(col(vecCol).as("vec"))
        .withColumn("bucket", nearestCentroid(spark, col("vec"), cents))
      val sums = (0 until dim).map(i =>
        sum(element_at(col("vec"), i + 1).cast("double")).as(s"s$i"))
      val aggs = count(lit(1)).as("n") +: sums
      val means = assigned.groupBy("bucket")
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .map { r =>
          val n = r.getAs[Long]("n").toDouble
          r.getAs[Int]("bucket") ->
            (0 until dim).map(i => (r.getAs[Double](s"s$i") / n).toFloat)
        }.toMap
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    cents
  }

  /** Shuffle-free nearest-centroid assignment: the native
    * [[graft.plans.NearestCentroid]] argmax kernel — pure projection, no
    * Exchange, no window; the row norm is computed once and centroid norms
    * are cached at plan build, so per-row cost is a single fused loop
    * (the prior `greatest()`-of-cosine-structs fold re-walked the vector
    * 2×nlist times and outgrew Janino past ~16 centroids). Ties break to
    * the smallest cent_id (bit-parity with the fold, pinned in PlansSpec).
    *
    * Assumes `centroids` ids are 0..n-1 in order (the contract of
    * [[headCentroids]]/[[trainCentroidsKMeans]]). */
  def nearestCentroid(
      spark: org.apache.spark.sql.SparkSession,
      vec: Column,
      centroids: Seq[(Int, Seq[Float])]): Column = {
    require(centroids.zipWithIndex.forall { case ((cid, _), i) => cid == i },
      "centroid ids must be 0..n-1 in order")
    // ONE Literal node for the whole matrix: the per-element
    // array(array(lit...)) form carried nlist×dim expression nodes through
    // every analysis pass, which dominates plan time once nlist ≈ √n
    // (iterative consumers like connected components re-analyze the tree
    // each round)
    val matrix = typedLit(centroids.map(_._2))
    GraftExtensions.nearestCentroid(spark, vec, matrix)
  }

  /** Query-side probe buckets: the `nprobe` nearest centroids per query row,
    * via sort of the (negated-cos, cent_id) struct array — on the small query
    * side only; the corpus is never windowed. */
  private[graft] def probeBuckets(
      spark: org.apache.spark.sql.SparkSession,
      vec: Column,
      centroids: Seq[(Int, Seq[Float])],
      nprobe: Int): Column = {
    val scored = array(centroids.map { case (cid, cvec) =>
      struct(
        (-GraftExtensions.cosine(spark, vec, typedLit(cvec))).as("nc"),
        lit(cid).as("i"))
    }: _*)
    transform(slice(array_sort(scored), 1, nprobe), s => s.getField("i"))
  }

  /** int8 scalar quantization of an embedding column: per-vector symmetric
    * scale (127 / max|x|), elements rounded by the PORTABLE formula
    * `floor(x * scale + 0.5)` (exact in any engine — no half-even/half-up
    * ambiguity), stored as `array<tinyint>` (4x smaller than float32 on the
    * wire and in cache; parquet dictionary/bit-packing shrinks it further).
    *
    * Cosine is scale-invariant, so quantized vectors feed the SAME scoring
    * kernels — `sim_q(a,b) = cos(q_a, q_b) ~ cos(a,b)` with ~0.3% error at
    * int8. One pass at index-build time (the transform lambdas are
    * interpreted, which is fine off the hot read path).
    * Output: (idCol, `qvec` array<tinyint>, `qscale` double). */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val maxAbs = array_max(transform(col(vecCol), x => abs(x)))
    emb.select(col(idCol), col(vecCol))
      .withColumn("__scale",
        when(maxAbs > 0.0f, lit(127.0) / maxAbs.cast("double")).otherwise(lit(0.0)))
      .select(col(idCol),
        transform(col(vecCol),
          x => floor(x.cast("double") * col("__scale") + 0.5).cast("tinyint"))
          .as("qvec"),
        col("__scale").as("qscale"))
  }

  /** Brute-force top-k over int8-quantized vectors — the quantized twin of
    * [[bruteForceTopK]] (casts tinyint arrays to float once, then the same
    * codegen'd cosine kernel). */
  def bruteForceTopKQuantized(
      qcorpus: DataFrame,
      qqueries: DataFrame,
      idCol: String,
      k: Int): DataFrame = {
    def asFloat(df: DataFrame, out: String) = df.select(col(idCol).as(out),
      transform(col("qvec"), x => x.cast("float")).as(s"__v_$out"))
    val q = broadcast(asFloat(qqueries, "query_id"))
    val c = asFloat(qcorpus, "neighbor_id")
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        GraftExtensions.cosine(qcorpus.sparkSession,
          col("__v_query_id"), col("__v_neighbor_id")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-bucketed approximate top-k: corpus assigned to its nearest centroid
    * bucket once (write-time, shuffle-free literal argmax), queries probe the
    * `nprobe` nearest centroid buckets only. `centroids` is an explicit
    * index parameter ((cent_id, vector) pairs — [[headCentroids]] stand-ins
    * or [[trainCentroidsKMeans]] output), mirroring a trained IVF index.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Seq[(Int, Seq[Float])],
      nprobe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession

    val bucketedCorpus = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol),
        nearestCentroid(spark, col(vecCol), centroids).as("bucket"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        explode(probeBuckets(spark, col(vecCol), centroids, nprobe)).as("bucket"))

    val scored = bucketedCorpus.join(broadcast(probes), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        GraftExtensions.cosine(spark, col("qvec"), col(vecCol)).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Mutual-kNN graph: edges `(a, b)` where b is in a's cosine top-k AND
    * a is in b's — the reciprocal-neighbor filter that turns a kNN list
    * into a robust similarity graph (one-directional neighbors are the
    * classic hub/noise artifact in high dimensions; mutuality is the
    * standard edge rule for dedup/cluster graphs over embeddings —
    * SemDeDup-style grouping, kNN-graph clustering, RAG corpus linking).
    *
    * This is the EXACT formulation: one all-queries [[bruteForceTopK]]
    * (the corpus broadcast-joins itself; per-query rank windows), then
    * the k-bounded top-k table self-joins on the reversed pair — at most
    * n·k rows enter that join, so the mutuality step is trivially
    * scale-safe; the quadratic part is the exact kNN itself, which at
    * 100 TB would be replaced by an [[ivfTopK]] / [[pqAdcRecall]]-coded
    * candidate stage feeding the same mutuality join (the edge rule is
    * candidate-source-agnostic).
    *
    * Returns `(id_a, id_b, rank_ab, rank_ba)`, id_a < id_b. */
  def mutualTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    // Every vector is a query here, so the window top-k would shuffle and
    // sort the FULL n² candidate table; instead:
    //  - cosine is symmetric and graft_cosine's IEEE sequence is too, so
    //    each UNORDERED pair (a < b) is scored ONCE and an in-stage
    //    explode emits both directions — half the joins, half the cosines,
    //    zero recompute (the explode is a generator, not a second branch);
    //  - the bounded aggregator keeps k pairs per query per map task —
    //    identical rows/ranks to the window ((cos desc, id asc) is total;
    //    see BoundedTopKPairs).
    val q = broadcast(emb.select(col(idCol).as("query_id"), col(vecCol).as("qvec")))
    val half = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .join(q, col("query_id") < col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.plans.GraftExtensions.cosine(
          emb.sparkSession, col("qvec"), col("cvec")).as("cos"))
    val scored = half
      .select(explode(array(
          struct(col("query_id").as("q"), col("neighbor_id").as("n")),
          struct(col("neighbor_id").as("q"), col("query_id").as("n"))))
          .as("__e"),
        col("cos"))
      .select(col("__e.q").as("query_id"), col("__e.n").as("neighbor_id"),
        col("cos"))
    val tk = udaf(graft.functions.BoundedTopKPairs(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[graft.functions.ScoredId]())
    val top = scored
      .groupBy(col("query_id"))
      .agg(tk(col("cos"), col("neighbor_id")).as("__top"))
      .select(col("query_id"),
        posexplode(col("__top")).as(Seq("__pos", "__s")))
      .select(col("query_id"), col("__s.id").as("neighbor_id"),
        (col("__pos") + 1L).cast("long").as("rank"))
    val fwd = top.select(col("query_id").as("id_a"),
      col("neighbor_id").as("id_b"), col("rank").as("rank_ab"))
    val rev = top.select(col("neighbor_id").as("id_a"),
      col("query_id").as("id_b"), col("rank").as("rank_ba"))
    fwd.join(rev, Seq("id_a", "id_b"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("rank_ab"), col("rank_ba"))
  }

  /** IVF-bucketed mutual-kNN — the 100 TB scale path [[mutualTopK]]'s
    * scaladoc promises: the quadratic exact-kNN candidate stage is replaced
    * by IVF coarse quantization (corpus bucketed once by nearest centroid,
    * every vector probes its `nprobe` nearest buckets), and the SAME
    * k-bounded top-k + reciprocal join runs on the bucketed candidates.
    * Candidate volume drops from n² to ~n²·nprobe/nlist; with
    * nlist ≈ √n that is O(n^1.5·nprobe) — sub-quadratic and
    * shuffle-partitioned on the bucket id (≈√n keys, so parallelism GROWS
    * with the corpus; AQE splits any skewed mega-bucket).
    *
    * Approximation surface is exactly IVF's: an edge is found iff each
    * endpoint's bucket is within the other's probe set; ranks are positions
    * within the probed candidates. Deterministic given the corpus —
    * centroids come from [[headCentroids]]/[[trainCentroidsKMeans]], ties
    * break (cos desc, id asc) everywhere — so an oracle replays it exactly.
    *
    * Returns `(id_a, id_b, rank_ab, rank_ba)`, id_a < id_b, like
    * [[mutualTopK]]. */
  def mutualTopKIvf(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Seq[(Int, Seq[Float])],
      nprobe: Int = 4): DataFrame = {
    val top = ivfTopKAll(emb, idCol, vecCol, k, centroids, nprobe)
    val fwd = top.select(col("query_id").as("id_a"),
      col("neighbor_id").as("id_b"), col("rank").as("rank_ab"))
    val rev = top.select(col("neighbor_id").as("id_a"),
      col("query_id").as("id_b"), col("rank").as("rank_ba"))
    fwd.join(rev, Seq("id_a", "id_b"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("rank_ab"), col("rank_ba"))
  }

  /** Every-vector-is-a-query IVF top-k — [[ivfTopKAll]] is [[ivfTopK]]'s
    * corpus-scale sibling: the probe side is the whole corpus, so the
    * probe join is a bucket-keyed SHUFFLE join (not a broadcast) and the
    * per-query top-k is the k-bounded aggregator (not a rank window over
    * all candidates). Candidate volume ~n²·nprobe/nlist; with nlist ≈ √n
    * this is the sub-quadratic all-pairs-kNN building block
    * ([[mutualTopKIvf]], label-purity audits, kNN-graph construction).
    * Returns `(query_id, neighbor_id, rank)`, rank 1..k by
    * (cos desc, id asc) within the probed candidates. */
  def ivfTopKAll(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Seq[(Int, Seq[Float])],
      nprobe: Int = 4): DataFrame = {
    val spark = emb.sparkSession
    val bucketed = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      nearestCentroid(spark, col(vecCol), centroids).as("bucket"))
    val probes = emb.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      explode(probeBuckets(spark, col(vecCol), centroids, nprobe)).as("bucket"))
    val scored = bucketed.join(probes, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        GraftExtensions.cosine(spark, col("qvec"), col("cvec")).as("cos"))
    val tk = udaf(graft.functions.BoundedTopKPairs(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[graft.functions.ScoredId]())
    scored
      .groupBy(col("query_id"))
      .agg(tk(col("cos"), col("neighbor_id")).as("__top"))
      .select(col("query_id"),
        posexplode(col("__top")).as(Seq("__pos", "__s")))
      .select(col("query_id"), col("__s.id").as("neighbor_id"),
        (col("__pos") + 1L).cast("long").as("rank"))
  }

  /** Product-quantization ADC recall ablation (Jégou, Douze & Schmid,
    * TPAMI 2011 — the memory-cheapening half of IVF-PQ, the industry-
    * standard billion-scale ANN layout): each vector is encoded as `m`
    * sub-space codebook ids (here m=8 × 4-bit codes = 4 bytes per vector
    * vs 256 bytes of floats), and a query scans codes with the
    * Asymmetric Distance Computation — one `m × codebookSize` lookup
    * table of query-to-centroid sub-distances, approx distance =
    * `Σ_m dtab[m][code_m]`. This operator measures what that 64×
    * compression costs: overlap of the ADC top-k with the exact cosine
    * top-k per probe.
    *
    * Codebooks here are caller-supplied vectors with ids `0 ..
    * codebookSize-1` (the q130 query passes a deterministic corpus slice;
    * production would pass [[trainCentroidsKMeans]] output per subspace).
    * EVERY arithmetic step is a fixed-order chain of IEEE ops on doubles
    * — sub-distances are left-associated 8-term sums, code assignment is
    * `min(struct(dist, cid))` (ties to the smaller centroid id), ADC is a
    * left-associated m-term sum of array lookups — so the DuckDB oracle
    * replays distances, codes, ranks and recall bit-for-bit; no
    * transcendentals, no aggregation-order dependence.
    *
    * Scale shape: the codebook broadcasts (m·K·dim floats — tiny by
    * construction; that boundedness is PQ's premise); encoding is one
    * corpus × K broadcast cross-join folded by a map-side-combined
    * min-struct aggregate — ONE shuffle on the vector id, the standard
    * distributed PQ-encode pass; the per-query table is query-grain; the
    * ADC scan is the code table against broadcast query tables (compose
    * with [[ivfTopK]]'s bucket routing to scan a cell subset instead of
    * the full code table); top-k is a per-query rank window.
    *
    * Returns `(query_id, n_overlap, recall)` against the exact top-`k`.
    */
  def pqAdcRecall(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      dim: Int = 64,
      codebookSize: Int = 16,
      k: Int = 5): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    require(codebookSize >= 2, "need at least 2 codewords")
    val cents = broadcast(centroids.select(
      col(idCol).cast("int").as("__cid"), col(vecCol).as("__cvec")))
    val codes = pqCodes(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__v")),
      cents, m, dim, Seq("neighbor_id"))
    val dtab = pqDtab(queries, cents, idCol, vecCol, m, dim, codebookSize)
    val pqTop = pqScan(codes, dtab, m, codebookSize, k)
    pqRecallVs(bruteForceTopK(corpus, queries, idCol, vecCol, k), pqTop, k)
  }

  /** IVF-PQ search + recall (q132) — the composed billion-scale ANN
    * layout: [[ivfTopK]]'s cell routing bounds WHICH codes a query scans,
    * [[pqAdcRecall]]'s codes bound WHAT each comparison costs. The corpus
    * is assigned to its nearest IVF centroid AND PQ-encoded in the same
    * pass (one shuffle on the vector id carries both); a query probes its
    * `nprobe` nearest cells and ADC-scans only the codes in them — the
    * fraction of the corpus touched is ~nprobe/nlist, the IVF pruning
    * argument, and each touched code costs m array lookups, the PQ
    * argument. Recall is measured against the exact cosine top-k, so the
    * result quantifies BOTH approximations together.
    *
    * Same engine-exactness contract as [[pqAdcRecall]] (fixed-order IEEE
    * chains end to end); cell assignment/probing reuse the q17 native
    * centroid expressions (cosine metric, ties to the lower cell id).
    *
    * Returns `(query_id, n_overlap, recall)`. */
  def ivfPqRecall(
      corpus: DataFrame,
      queries: DataFrame,
      ivfCentroids: Seq[(Int, Seq[Float])],
      pqCentroids: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      dim: Int = 64,
      codebookSize: Int = 16,
      nprobe: Int = 4,
      k: Int = 5): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    require(codebookSize >= 2, "need at least 2 codewords")
    require(nprobe >= 1 && nprobe <= ivfCentroids.size, "nprobe in [1, nlist]")
    val spark = corpus.sparkSession
    val cents = broadcast(pqCentroids.select(
      col(idCol).cast("int").as("__cid"), col(vecCol).as("__cvec")))
    // one corpus pass: IVF cell + PQ codes together
    val codes = pqCodes(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__v"),
        nearestCentroid(spark, col(vecCol), ivfCentroids).as("__cell")),
      cents, m, dim, Seq("neighbor_id", "__cell"))
    val probes = queries.select(col(idCol).as("query_id"),
      explode(probeBuckets(spark, col(vecCol), ivfCentroids, nprobe))
        .as("__cell"))
    val dtab = pqDtab(queries, cents, idCol, vecCol, m, dim, codebookSize)
      .join(probes, "query_id") // query-grain x nprobe, still broadcastable
    val pqTop = pqScan(codes, dtab, m, codebookSize, k, joinKeys = Seq("__cell"))
    pqRecallVs(bruteForceTopK(corpus, queries, idCol, vecCol, k), pqTop, k)
  }

  /** Left-associated per-subspace squared L2 — the fixed-order IEEE chain
    * every PQ step shares (the oracle emits the identical chain). */
  private def pqSubDist(v: String, c: String, mi: Int, sub: Int): Column =
    (0 until sub).map { j =>
      val a = element_at(col(v), mi * sub + j + 1).cast("double")
      val b = element_at(col(c), mi * sub + j + 1).cast("double")
      (a - b) * (a - b)
    }.reduce(_ + _)

  /** PQ encode: min-struct argmin per subspace (ties to the smaller
    * codeword id), grouped on `keyCols` — ONE shuffle on the vector id. */
  private def pqCodes(
      corpus: DataFrame, cents: DataFrame, m: Int, dim: Int,
      keyCols: Seq[String]): DataFrame = {
    val sub = dim / m
    val codeAggs = (0 until m).map { mi =>
      min(struct(pqSubDist("__v", "__cvec", mi, sub).as("d"), col("__cid").as("c")))
        .getField("c").as(s"__c$mi")
    }
    corpus.crossJoin(cents)
      .groupBy(keyCols.map(col): _*)
      .agg(codeAggs.head, codeAggs.tail: _*)
  }

  /** Per-query ADC lookup table as ONE m·K array (index `m·K + cid`). */
  private def pqDtab(
      queries: DataFrame, cents: DataFrame, idCol: String, vecCol: String,
      m: Int, dim: Int, codebookSize: Int): DataFrame = {
    val sub = dim / m
    // project the m sub-distance chains ONCE per (query, centroid) row
    // before the pivot: inlining the chain into each of the m·K
    // min(when(...)) aggregates re-evaluated it K× per row (measured
    // 3.5× slower on q130's grain — aggregate expressions don't share
    // common subexpressions across buffers)
    val qdists = (0 until m).map(mi =>
      pqSubDist("__q", "__cvec", mi, sub).as(s"__qd$mi"))
    val dtabAggs = (0 until m).flatMap { mi =>
      (0 until codebookSize).map { c =>
        min(when(col("__cid") === c, col(s"__qd$mi"))).as(s"__d_${mi}_$c")
      }
    }
    queries.select(col(idCol).as("query_id"), col(vecCol).as("__q"))
      .crossJoin(cents)
      .select(Seq(col("query_id"), col("__cid")) ++ qdists: _*)
      .groupBy("query_id")
      .agg(dtabAggs.head, dtabAggs.tail: _*)
      .select(col("query_id"),
        array((0 until m).flatMap(mi => (0 until codebookSize)
          .map(c => col(s"__d_${mi}_$c"))): _*).as("__dtab"))
  }

  /** ADC scan: codes x broadcast query tables (optionally cell-routed via
    * `joinKeys`), left-associated lookup sum, per-query top-k rank. */
  private def pqScan(
      codes: DataFrame, dtab: DataFrame, m: Int, codebookSize: Int, k: Int,
      joinKeys: Seq[String] = Nil): DataFrame = {
    val adist = (0 until m).map { mi =>
      element_at(col("__dtab"),
        (col(s"__c$mi") + lit(mi * codebookSize) + 1).cast("int"))
    }.reduce(_ + _)
    val joined =
      if (joinKeys.isEmpty) codes.crossJoin(broadcast(dtab))
      else codes.join(broadcast(dtab), joinKeys)
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    joined
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), adist.as("adist"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id")
  }

  /** Overlap of an approximate top-k with the exact list, per query. */
  private def pqRecallVs(
      exactTop: DataFrame, approxTop: DataFrame, k: Int): DataFrame =
    exactTop.select(col("query_id"), col("neighbor_id"))
      .join(approxTop.withColumn("__hit", lit(1L)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_overlap"))
      .select(col("query_id"), col("n_overlap"),
        (col("n_overlap").cast("double") / k).as("recall"))

  /** Truncated rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010)
    * between two per-query rankings — the rank-AWARE companion to the
    * recall ablations (q122/q128/q130): recall says how many exact
    * neighbors survive, RBO says whether they survive IN ORDER, weighting
    * agreement at rank 1 heaviest.
    *
    * With persistence p = 1/2, RBO@d = Σ_{k≤d} |A_k ∩ B_k| / (2^k·k)
    * (A_k = top-k prefix). All arithmetic is EXACT integers: overlaps are
    * counts, and the weights scale by S = lcm(2^k·k) so
    * `rbo_scaled = Σ ov_k · S/(2^k k)` with perfect agreement =
    * `rbo_max = Σ k · S/(2^k k)` (< S: truncation keeps the tail mass
    * unassigned, as the paper's lower bound does). No floats anywhere, so
    * any engine replays it bit-for-bit.
    *
    * Inputs are (query_id, neighbor_id, rank) tables (the shape every
    * top-k kernel here emits); both are query-grain-bounded (≤ d rows per
    * query), so the join and aggregate are tiny regardless of corpus
    * size. Queries with zero overlap keep a row (left join from the
    * query list). */
  def rboTruncated(rankA: DataFrame, rankB: DataFrame, depth: Int): DataFrame = {
    require(depth >= 1 && depth <= 20, "depth must be in [1, 20]")
    def lcm(a: Long, b: Long): Long = a / BigInt(a).gcd(BigInt(b)).toLong * b
    val dens = (1 to depth).map(k => (1L << k) * k)
    val s = dens.foldLeft(1L)(lcm)
    val ws = dens.map(s / _)
    val rboMax = (1 to depth).map(k => k * ws(k - 1)).sum
    def pre(df: DataFrame, r: String) =
      df.select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as(r))
    val j = pre(rankA, "__ra").join(pre(rankB, "__rb"),
      Seq("query_id", "neighbor_id"))
    val ovAggs = (1 to depth).map(k =>
      sum(when(col("__ra") <= k && col("__rb") <= k, 1L).otherwise(0L))
        .as(s"ov$k"))
    val agg = j.groupBy("query_id").agg(ovAggs.head, ovAggs.tail: _*)
    val ovCols = (1 to depth).map(k => coalesce(col(s"ov$k"), lit(0L)).as(s"ov$k"))
    rankA.select("query_id").distinct()
      .join(agg, Seq("query_id"), "left")
      .select(col("query_id") +: ovCols: _*)
      .withColumn("rbo_scaled",
        (1 to depth).map(k => col(s"ov$k") * lit(ws(k - 1))).reduce(_ + _))
      .withColumn("rbo_max", lit(rboMax))
  }
}
