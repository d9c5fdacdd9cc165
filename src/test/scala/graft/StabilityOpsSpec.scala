package graft

import graft.operators.{Drift, HeavyHitters, Sharding}

/** Hand-checked kernels for the stability/governance additions: rendezvous
  * shard stability (q147), persistent heavy hitters (q148), source
  * vocabulary Jaccard (q149). */
class StabilityOpsSpec extends SparkSpec {
  import spark.implicits._

  private def md5h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(1, 16), 16)
  }

  test("rendezvousShard matches a JVM replay of the argmax") {
    val ids = (1L to 200L).toSeq
    def expected(id: Long, k: Int): Long =
      (0 until k).map(s => (md5h60(s"$id:$s"), s))
        .maxBy { case (h, s) => (h, -s) }._2.toLong
    val got = ids.toDF("id")
      .select($"id", Sharding.rendezvousShard($"id", 8).as("s8"),
        Sharding.rendezvousShard($"id", 9).as("s9"))
      .as[(Long, Long, Long)].collect().toSeq
    for ((id, s8, s9) <- got) {
      assert(s8 == expected(id, 8), s"id $id k=8")
      assert(s9 == expected(id, 9), s"id $id k=9")
    }
    // the consistent-hashing contract: growing 8 -> 9 only ever moves a
    // key INTO the new shard 8, never between old shards
    assert(got.forall { case (_, s8, s9) => s9 == s8 || s9 == 8L })
  }

  test("shardStability: rendezvous migration is a fraction of mod's") {
    val df = (1L to 500L).toDF("id")
    val got = Sharding.shardStability(df, "id", 8, 9)
      .orderBy("strategy").as[(String, Long, Long, Long)].collect().toSeq
    val byStrat = got.map(r => r._1 -> r).toMap
    assert(byStrat("mod")._2 == 500L && byStrat("rendezvous")._2 == 500L)
    // expectations: mod ~ 8/9 (889k ppm), rendezvous ~ 1/9 (111k ppm);
    // wide tolerances — the point is the structural gap
    assert(byStrat("mod")._4 > 700000L, s"mod moved: ${byStrat("mod")}")
    assert(byStrat("rendezvous")._4 < 300000L,
      s"rendezvous moved: ${byStrat("rendezvous")}")
  }

  test("persistentHitters: epoch ranks, min-epoch gate, key tie-break") {
    // epochs 0..2; key 1 top in all three, key 2 in two, key 3 in one
    val rows =
      Seq.fill(5)((0L, 1L)) ++ Seq.fill(3)((0L, 2L)) ++ Seq.fill(1)((0L, 3L)) ++
      Seq.fill(5)((1L, 1L)) ++ Seq.fill(3)((1L, 2L)) ++
      Seq.fill(5)((2L, 1L)) ++ Seq.fill(1)((2L, 3L))
    val df = rows.toDF("ep", "k")
    val got = HeavyHitters.persistentHitters(df, "ep", "k", k = 2, minEpochs = 2)
      .orderBy("key").as[(Long, Long, Long, Long)].collect().toSeq
    // key 1: top-2 in 3 epochs (rank 1 each, max cnt 5)
    // key 2: rank 2 in epochs 0,1 → 2 epochs
    // key 3: rank 2 in epoch 2 only (epoch 0 rank 3 — out) → gated
    assert(got == Seq((1L, 3L, 1L, 5L), (2L, 2L, 2L, 3L)))
  }

  test("persistentHitters: rank ties go to the smaller key") {
    // epoch 0: keys 7 and 8 both count 2, k=1 → key 7 wins the only slot
    val df = Seq((0L, 7L), (0L, 7L), (0L, 8L), (0L, 8L)).toDF("ep", "k")
    val got = HeavyHitters.persistentHitters(df, "ep", "k", k = 1, minEpochs = 1)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((7L, 1L, 1L, 2L)))
  }

  test("giniByKey: closed-form runs match the textbook formula") {
    val df = Seq(
      ("eq", 5L), ("eq", 5L), ("eq", 5L), ("eq", 5L),      // uniform -> 0
      ("mx", 1L), ("mx", 2L), ("mx", 3L), ("mx", 4L),      // 10/40 -> 250000
      ("sk", 0L), ("sk", 0L), ("sk", 0L), ("sk", 12L))     // (n-1)/n -> 750000
      .toDF("k", "v")
    val got = graft.operators.Profiling.giniByKey(df, "k", "v")
      .orderBy("k").as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      ("eq", 4L, 20L, Some(0L)),
      ("mx", 4L, 10L, Some(250000L)),
      ("sk", 4L, 12L, Some(750000L))))
  }

  test("giniByKey: zero-total group reports null, ties collapse to one run") {
    val df = Seq(("z", 0L), ("z", 0L), ("t", 7L), ("t", 7L), ("t", 1L))
      .toDF("k", "v")
    val got = graft.operators.Profiling.giniByKey(df, "k", "v")
      .orderBy("k").as[(String, Long, Long, Option[Long])].collect().toSeq
    // t: sorted (1,7,7): S1 = 1 + 2*7 + 3*7 = 36; num = 72 - 4*15 = 12;
    // den = 45 -> 266666
    assert(got == Seq(("t", 3L, 15L, Some(266666L)), ("z", 2L, 0L, None)))
  }

  test("sourceVocabJaccard: exact set arithmetic on hand vocabularies") {
    // a: {x,y,z}; b: {y,z,w}; c: {q}
    val docs = Seq(
      ("a", "x y"), ("a", "z y"),
      ("b", "y z w"),
      ("c", "q q q")).toDF("src", "text")
    val got = Drift.sourceVocabJaccard(docs, "src", "text")
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    // a∩b = {y,z} = 2, union 4 → 500000 ppm; c intersects nothing
    assert(got == Seq(("a", "b", 2L, 4L, 500000L)))
  }
}
