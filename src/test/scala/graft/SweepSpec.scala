package graft

import graft.operators.{SaltedJoin, Sweep}
import org.apache.spark.sql.functions._

/** Sweep-line concurrency (q158) and salted-join equivalence (q159). */
class SweepSpec extends SparkSpec {
  import spark.implicits._

  test("maxConcurrency: hand-checked sweep with closed-interval semantics") {
    // bucket width 10: [1,5],[3,8],[8,12],[20,21],[21,30]
    val iv = Seq((1L, 5L), (3L, 8L), (8L, 12L), (20L, 21L), (21L, 30L))
      .toDF("s", "e")
    val got = Sweep.maxConcurrency(iv, "s", "e", bucketWidth = 10L)
      .orderBy("bucket").as[(Long, Long, Long)].collect().toSeq
    // t=1:+1(1) t=3:+1(2) t=6:-1(1) t=8:+1-0... deltas: +1@1,+1@3,-1@6,
    // +1@8,-1@9,-1@13,+1@20,+1@21,-1@22,-1@31
    // bucket 0 (t<10): cums 1,2,1,2,1 -> max 2, changes at {1,3,6,8,9}=5
    // bucket 1: t=13 cum 0 -> max 0, 1 change
    // bucket 2: t=20 cum 1, t=21 cum 2, t=22 cum 1 -> max 2, 3 changes
    // bucket 3: t=31 cum 0 -> max 0, 1 change
    assert(got == Seq((0L, 5L, 2L), (1L, 1L, 0L), (2L, 3L, 2L), (3L, 1L, 0L)))
  }

  test("maxConcurrency: touching endpoints overlap; adjacent do not") {
    val touching = Seq((1L, 5L), (5L, 9L)).toDF("s", "e")
    assert(Sweep.maxConcurrency(touching, "s", "e", 100L)
      .select("max_concurrency").as[Long].head() == 2L)
    val adjacent = Seq((1L, 5L), (6L, 9L)).toDF("s", "e")
    assert(Sweep.maxConcurrency(adjacent, "s", "e", 100L)
      .select("max_concurrency").as[Long].head() == 1L)
  }

  test("maxConcurrency: carry crosses empty buckets intact") {
    // one long interval [5, 35] plus a spike in bucket 3
    val iv = Seq((5L, 35L), (31L, 32L)).toDF("s", "e")
    val got = Sweep.maxConcurrency(iv, "s", "e", 10L)
      .orderBy("bucket").as[(Long, Long, Long)].collect().toSeq
    // bucket 0: +1@5 -> max 1; bucket 1,2: no boundaries (omitted);
    // bucket 3: +1@31 (cum 2), -1@33, -1@36 -> max 2
    assert(got == Seq((0L, 1L, 1L), (3L, 3L, 2L)))
  }

  test("maxConcurrency matches brute force on real session intervals") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val sess = graft.operators.Sessionize.sessionize(
      ev.select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("t")),
      "user_id", "t", gapUs = 21600000000L, purchaseCond = lit(false))
      .select(col("session_start_us").as("s"), col("session_end_us").as("e"))
    val ivs = sess.as[(Long, Long)].collect()
    val got = Sweep.maxConcurrency(sess, "s", "e", 86400000000L)
      .orderBy("bucket").as[(Long, Long, Long)].collect().toSeq
    val deltas = (ivs.map(i => (i._1, 1L)) ++ ivs.map(i => (i._2 + 1, -1L)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var cum = 0L
    val perBucket = scala.collection.mutable.Map[Long, (Long, Long)]()
    for ((t, net) <- deltas) {
      cum += net
      val b = Math.floorDiv(t, 86400000000L)
      val (n, m) = perBucket.getOrElse(b, (0L, Long.MinValue))
      perBucket(b) = (n + 1, math.max(m, cum))
    }
    val want = perBucket.toSeq.map { case (b, (n, m)) => (b, n, m) }.sortBy(_._1)
    assert(got == want)
  }

  test("latenessAudit: hand case with cross-bucket carry") {
    // arrival order 0..5, bucket width 3; event times: 10, 50, 20, 30, 60, 55
    val df = Seq((0L, 10L), (1L, 50L), (2L, 20L), (3L, 30L), (4L, 60L), (5L, 55L))
      .toDF("o", "t")
    val got = Sweep.latenessAudit(df, "o", "t", bucketWidth = 3L, lateThreshold = 10L)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect().toSeq
    // bucket 0: runmax 10,50,50 -> lateness 0,0,30 (1 late); max 30
    // bucket 1: carry 50 -> runmax 50,60,60 -> lateness 20,0,5 (1 late); max 20
    assert(got == Seq((0L, 3L, 1L, 30L), (1L, 3L, 1L, 20L)))
  }

  test("latenessAudit matches the global running-max replay on events") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
    val got = Sweep.latenessAudit(ev, "event_id", "t", 512L, 300000000L)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect().toSeq
    val rows = ev.as[(Long, Long)].collect().sortBy(_._1)
    var rm = Long.MinValue
    val agg = scala.collection.mutable.LinkedHashMap[Long, (Long, Long, Long)]()
    for ((id, t) <- rows) {
      rm = math.max(rm, t)
      val late = rm - t
      val b = Math.floorDiv(id, 512L)
      val (n, nl, mx) = agg.getOrElse(b, (0L, 0L, Long.MinValue))
      agg(b) = (n + 1, nl + (if (late > 300000000L) 1L else 0L), math.max(mx, late))
    }
    val want = agg.toSeq.map { case (b, (n, nl, mx)) => (b, n, nl, mx) }.sortBy(_._1)
    assert(got == want)
  }

  test("saltedEquiJoin: row-identical to the plain join, salts spread keys") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_partkey").as("pk"), col("l_orderkey"), col("l_linenumber"))
    val pt = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select(col("p_partkey").as("pk"), col("p_brand"))
    val salted = SaltedJoin.saltedEquiJoin(li, pt, "pk",
      Seq("l_orderkey", "l_linenumber"), nSalts = 8)
      .select("pk", "l_orderkey", "l_linenumber", "p_brand")
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    val plain = li.join(pt, "pk")
      .select("pk", "l_orderkey", "l_linenumber", "p_brand")
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
    // determinism: a re-run derives the same salts (retry safety)
    val again = SaltedJoin.saltedEquiJoin(li, pt, "pk",
      Seq("l_orderkey", "l_linenumber"), nSalts = 8)
      .select("pk", "l_orderkey", "l_linenumber", "p_brand")
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    assert(again == salted)
    // the hot key's rows actually land on several salts
    val hot = li.groupBy("pk").count().orderBy(col("count").desc)
      .select("pk").as[Long].head()
    val spread = li.filter(col("pk") === hot)
      .withColumn("salt", pmod(graft.functions.PortableHash.md5Hash60(
        concat_ws("", col("l_orderkey"), col("l_linenumber"))), lit(8L)))
      .select("salt").distinct().count()
    assert(spread >= 3, s"hot key spread over only $spread salts")
  }
}
