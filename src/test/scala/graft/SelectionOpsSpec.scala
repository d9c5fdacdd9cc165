package graft

import graft.operators.{Calibration, Coreset, GoldenRecord, Similarity}
import org.apache.spark.sql.functions._

/** Selection/calibration wave: k-center coreset, binned isotonic
  * calibration, golden-record survivorship, kNN label purity. */
class SelectionOpsSpec extends SparkSpec {
  import spark.implicits._

  private def v(x: Double, y: Double): Seq[Float] =
    (Seq(x.toFloat, y.toFloat) ++ Seq.fill(62)(0f))

  test("kCenterAssign: three separated groups yield one center per group") {
    // groups along three near-orthogonal directions; seed = id 0 (group A).
    // Greedy farthest-point must then pick one member of each other group,
    // and every point must assign to its own group's center.
    val df = Seq(
      (0L, v(1.0, 0.0)), (1L, v(1.0, 0.02)),
      (10L, v(0.0, 1.0)), (11L, v(0.02, 1.0)),
      (20L, v(-1.0, 0.3)), (21L, v(-1.0, 0.32))
    ).toDF("vec_id", "embedding")
    val got = Coreset.kCenterAssign(df, "vec_id", "embedding", k = 3)
      .select("id", "center_id", "center_rank", "dist")
      .as[(Long, Long, Int, Double)].collect().sortBy(_._1)
    val centersByGroup = got.map(r => r._1 / 10 -> r._2).toMap
    // each group's points share one center drawn from that group
    got.foreach { case (id, cid, rank, dist) =>
      assert(cid / 10 == id / 10, s"point $id assigned across groups to $cid")
      assert(rank >= 0 && rank <= 2)
      assert(dist >= -1e-12 && dist <= 2.0)
    }
    assert(centersByGroup.values.toSet.size == 3)
    // seed is the min id and assigns to itself
    assert(got.find(_._1 == 0L).get._2 == 0L)
  }

  test("kCenterAssign prefix property: k=2 centers are a prefix of k=3") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def centers(k: Int): Seq[(Long, Int)] =
      Coreset.kCenterAssign(emb, "vec_id", "embedding", k)
        .where(col("id") === col("center_id"))
        .select("center_id", "center_rank").as[(Long, Int)]
        .collect().sortBy(_._2).toSeq
    val c2 = centers(2); val c3 = centers(3)
    assert(c3.take(2) == c2)
    assert(c3.map(_._1).distinct.size == 3)
  }

  test("isotonic: already-monotone bins pass through unchanged") {
    // scores land in distinct bins with increasing positive rate
    val rows = Seq.fill(10)((0.05, false)) ++ Seq((0.05, true)) ++ // ~9% at bin of 0.05
      Seq.fill(6)((0.45, true)) ++ Seq.fill(6)((0.45, false)) ++   // 50%
      Seq.fill(9)((0.95, true)) ++ Seq((0.95, false))              // 90%
    val df = rows.toDF("score", "y")
    val got = Calibration.isotonicCalibration(df, "score", "y", 0.0, 1.0, 10)
      .orderBy("bin")
      .select("bin", "n", "pos", "raw_rate", "iso_rate")
      .as[(Int, Long, Long, Double, Double)].collect()
    assert(got.length == 3)
    got.foreach { case (_, _, _, raw, iso) => assert(iso == raw) }
  }

  test("isotonic: a violating pair pools to its weighted mean") {
    // bin0: 3/4 positive; bin1: 1/4 positive -> violation; PAV pools to 4/8
    val rows =
      Seq.fill(3)((0.05, true)) ++ Seq.fill(1)((0.05, false)) ++
      Seq.fill(1)((0.95, true)) ++ Seq.fill(3)((0.95, false))
    val got = Calibration.isotonicCalibration(
      rows.toDF("score", "y"), "score", "y", 0.0, 1.0, 10)
      .orderBy("bin").select("iso_rate").as[Double].collect()
    assert(got.toSeq == Seq(0.5, 0.5))
  }

  test("isotonic output is always monotone non-decreasing (real scores)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = emb.orderBy("vec_id").limit(1)
      .select("vec_id", "embedding", "label").collect()(0)
    val scored = emb.where(col("vec_id") =!= a.getLong(0))
      .select(graft.plans.GraftExtensions.cosine(spark, col("embedding"),
        array(a.getSeq[Float](1).map(lit): _*)).as("score"),
        (col("label") === a.getInt(2)).as("y"))
    val got = Calibration.isotonicCalibration(scored, "score", "y", -1.0, 1.0, 32)
      .orderBy("bin").select("iso_rate").as[Double].collect()
    assert(got.nonEmpty)
    got.sliding(2).foreach {
      case Array(lo, hi) => assert(lo <= hi, s"non-monotone: $lo > $hi")
      case _ =>
    }
  }

  test("goldenRecords: mode survivorship with deterministic ties") {
    val recs = Seq(
      // cluster 1: source mode b (2 vs 1), lang tie en/fr -> en (lexicographic)
      (1L, 1L, "b", "en", 10L), (1L, 2L, "b", "fr", 30L), (1L, 3L, "a", "en", 20L),
      // singleton cluster 9
      (9L, 9L, "z", "zh", 5L)
    ).toDF("cluster", "doc_id", "source", "lang", "n_chars")
    val got = GoldenRecord.goldenRecords(recs, "cluster", "doc_id",
      categorical = Seq("source", "lang"), numericMax = Seq("n_chars"))
      .orderBy("cluster")
      .select("cluster", "canonical_id", "n_members", "n_chars_max",
        "source_gold", "lang_gold")
      .as[(Long, Long, Long, Long, String, String)].collect()
    assert(got.toSeq == Seq(
      (1L, 1L, 3L, 30L, "b", "en"),
      (9L, 9L, 1L, 5L, "z", "zh")))
  }

  test("mergeModeState: batch votes can flip a stored mode") {
    val store = Seq((1L, "a", 3L), (1L, "b", 2L)).toDF("k", "v", "cnt")
    val batch = Seq((1L, "b"), (1L, "b")).toDF("k", "v")
    val merged = GoldenRecord.mergeModeState(store, batch, "k", "v")
    val mode = GoldenRecord.modeFromState(merged, "k", "v", "cnt", "m")
      .as[(Long, String)].collect().toSeq
    assert(mode == Seq((1L, "b")), "b now has 4 votes vs a's 3")
    // and the merged state is the exact count sum
    val counts = merged.as[(Long, String, Long)].collect().toSet
    assert(counts == Set((1L, "a", 3L), (1L, "b", 4L)))
  }

  test("Coreset.assign against frozen centers covers every batch point") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val old = emb.filter(pmod(col("vec_id"), lit(10L)) =!= 0L)
    val batch = emb.filter(pmod(col("vec_id"), lit(10L)) === 0L)
    val centers = Coreset.selectCenters(old, "vec_id", "embedding", 3)
    val got = Coreset.assign(batch, "vec_id", "embedding", centers)
      .select("id", "center_id", "center_rank", "dist")
      .as[(Long, Long, Int, Double)].collect()
    assert(got.length == batch.count())
    val centerIds = centers.map(_._1).toSet
    got.foreach { case (_, cid, rank, dist) =>
      assert(centerIds.contains(cid) && rank >= 0 && rank < 3)
      assert(dist >= -1e-12 && dist <= 2.0 + 1e-12)
    }
  }

  test("ivfTopKAll label purity: uniform labels give purity 1.0") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("label", lit(7))
    val cents = Similarity.headCentroids(emb, "vec_id", "embedding", 4)
    val top = Similarity.ivfTopKAll(emb, "vec_id", "embedding", k = 3,
      centroids = cents, nprobe = 2)
    val lbl = emb.select(col("vec_id"), col("label"))
    val purity = top
      .join(lbl.toDF("query_id", "label"), Seq("query_id"))
      .join(lbl.toDF("neighbor_id", "nlabel"), Seq("neighbor_id"))
      .groupBy("query_id")
      .agg((sum(when(col("nlabel") === col("label"), 1L).otherwise(0L)) /
        count(lit(1))).as("p"))
      .select("p").as[Double].collect()
    assert(purity.nonEmpty && purity.forall(_ == 1.0))
  }

  test("ivfTopKAll ranks are dense 1..m within each query") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.headCentroids(emb, "vec_id", "embedding", 4)
    val got = Similarity.ivfTopKAll(emb, "vec_id", "embedding", k = 4,
      centroids = cents, nprobe = 2)
      .select("query_id", "rank").as[(Long, Long)].collect()
      .groupBy(_._1).values
    got.foreach { rs =>
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks == (1L to ranks.length).toSeq)
      assert(ranks.length <= 4)
    }
  }
}
