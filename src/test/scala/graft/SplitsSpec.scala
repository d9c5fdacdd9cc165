package graft

import graft.operators.{Rollups, Splits}
import org.apache.spark.sql.functions._

/** Hash-split assignment (stability is the whole point) and the exact-sum
  * Pearson kernel. */
class SplitsSpec extends SparkSpec {

  import spark.implicits._

  test("split proportions track ppm shares; assignment is deterministic") {
    val ids = (1L to 2000L).toDF("id")
    val s1 = Splits.hashSplit(ids, "id",
      Seq(("train", 800000L), ("val", 100000L), ("test", 100000L)))
    val counts = s1.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") / 2000.0 - 0.8) < 0.04, counts.toString)
    assert(math.abs(counts("val") / 2000.0 - 0.1) < 0.04, counts.toString)
    assert(math.abs(counts("test") / 2000.0 - 0.1) < 0.04, counts.toString)
    val s2 = Splits.hashSplit(ids, "id",
      Seq(("train", 800000L), ("val", 100000L), ("test", 100000L)))
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
  }

  test("assignments never move when the corpus grows (subset property)") {
    val full = (1L to 1000L).toDF("id")
    val early = (1L to 400L).toDF("id")
    val splits = Seq(("train", 900000L), ("test", 100000L))
    val ofFull = Splits.hashSplit(full, "id", splits)
      .where(col("id") <= 400)
    val ofEarly = Splits.hashSplit(early, "id", splits)
    assert(ofFull.exceptAll(ofEarly).isEmpty && ofEarly.exceptAll(ofFull).isEmpty)
  }

  test("salt isolates split families; invalid shares fail fast") {
    val ids = (1L to 500L).toDF("id")
    val a = Splits.hashSplit(ids, "id", Seq(("x", 500000L), ("y", 500000L)), salt = "s1")
    val b = Splits.hashSplit(ids, "id", Seq(("x", 500000L), ("y", 500000L)), salt = "s2")
    val differing = a.select("id", "split")
      .join(b.select(col("id"), col("split").as("split2")), "id")
      .where(col("split") =!= col("split2")).count()
    assert(differing > 100, s"salts must decorrelate, only $differing moved")
    intercept[IllegalArgumentException] {
      Splits.hashSplit(ids, "id", Seq(("x", 1L), ("y", 2L)))
    }
  }

  test("pairSplitLeakage: a same-group pair can never straddle the group law") {
    // 20 groups of 5 docs; every near-dup pair is WITHIN a group — the
    // configuration group-keyed splitting exists for
    val docs = (0L until 100L).map(i => (i, s"g${i / 5}")).toDF("doc_id", "source")
    val pairList = (0L until 100L by 5).flatMap(b => Seq((b, b + 1), (b + 2, b + 4)))
    val pairs = pairList.toDF("id_a", "id_b")
    val got = Splits.pairSplitLeakage(pairs, docs, "doc_id", "source",
      trainPpm = 800000L)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set("doc_hash", "group_hash"))
    // group law: zero straddle, zero exposure — structurally guaranteed
    val g = got("group_hash")
    assert(g._2 == 40 && g._3 == 40, s"n_pairs/n_same_group: $g")
    assert(g._4 == 0 && g._5 == 0 && g._6 == 0 && g._8 == 0,
      s"group law must have zero leakage on within-group pairs: $g")
    // doc law: straddle recomputed from the assignment law directly
    val assign = Splits.hashSplit(docs.select("doc_id"), "doc_id",
      Seq(("train", 800000L), ("held", 200000L)))
      .select(col("doc_id"), (col("split") === "train").as("t"))
      .as[(Long, Boolean)].collect().toMap
    val crossPairs = pairList.filter { case (a, b) => assign(a) != assign(b) }
    val d = got("doc_hash")
    assert(d._2 == 40 && d._3 == 40)
    assert(d._4 == crossPairs.size, s"doc-law n_cross: $d")
    assert(d._5 == (if (d._2 > 0) d._4 * 1000000L / d._2 else 0L))
    val leakedExp = crossPairs
      .map { case (a, b) => if (assign(a)) b else a }.distinct.size
    assert(d._6 == leakedExp, s"doc-law n_held_docs_leaked: $d")
    assert(d._7 == assign.count(!_._2), s"doc-law n_held_docs: $d")
    assert(d._8 == (if (d._7 > 0) d._6 * 1000000L / d._7 else 0L))
  }

  test("groupedPairSplitLeakage == pairSplitLeakage over the explicit expansion") {
    // exact-dup group structure: groups of size 1..6 (singletons included —
    // they contribute no within pairs but can leak through rep pairs),
    // rep = min member; rep pairs connect some groups; raw pairs are a
    // separate id space (the video posture). groupCol = the connected
    // component of the whole graph (min reachable member), so the
    // group-homogeneity contract holds by construction.
    val groupIds: Seq[Seq[Long]] = Seq(
      Seq(0L, 1L, 2L), Seq(10L, 11L), Seq(20L),
      Seq(30L, 31L, 32L, 33L, 34L, 35L), Seq(40L, 41L), Seq(50L),
      Seq(60L, 61L, 62L))
    val members = groupIds.flatMap(g => g.map(id => (id, g.min))).toDF("id", "rep")
    // rep graph: {0,10} {10,20} one chain; {30,40} another; 50, 60 isolated
    val repPairs = Seq((0L, 10L), (10L, 20L), (30L, 40L)).toDF("id_a", "id_b")
    // raw pairs over a disjoint id space (+ one raw pair inside a component
    // to exercise the distinct-leaked overlap)
    val rawPairs = Seq((100L, 101L), (101L, 102L), (0L, 1L)).toDF("id_a", "id_b")
    // components by hand: {0..2,10,11,20} -> 0; {30..35,40,41} -> 30;
    // {50} -> 50; {60..62} -> 60; raw ids 100..102 -> 100 (they pair, and
    // 0/1 already share component 0)
    val compOf: Long => Long = id =>
      if (id <= 20) 0L else if (id <= 41) 30L else if (id == 50) 50L
      else if (id <= 62) 60L else 100L
    val allIds = groupIds.flatten ++ Seq(100L, 101L, 102L)
    val docs = allIds.map(id => (id, compOf(id))).toDF("media_id", "component")
    // explicit expansion: all within pairs + all cross pairs per rep pair
    // + raw pairs — the formulation groupedPairSplitLeakage must match
    val byRep = groupIds.map(g => g.min -> g).toMap
    val within = groupIds.flatMap(g =>
      for (i <- g.indices; j <- i + 1 until g.size) yield (g(i), g(j)))
    val cross = Seq((0L, 10L), (10L, 20L), (30L, 40L)).flatMap { case (a, b) =>
      for (x <- byRep(a); y <- byRep(b)) yield (math.min(x, y), math.max(x, y))
    }
    val expanded = (within ++ cross ++ Seq((100L, 101L), (101L, 102L), (0L, 1L)))
      .toDF("id_a", "id_b")
    for (trainPpm <- Seq(200000L, 500000L, 800000L)) {
      val want = Splits.pairSplitLeakage(expanded, docs,
          "media_id", "component", trainPpm)
        .orderBy("split_law").collect().map(_.toSeq)
      val got = Splits.groupedPairSplitLeakage(members, repPairs, rawPairs,
          docs, "media_id", "component", trainPpm)
        .orderBy("split_law").collect().map(_.toSeq)
      assert(got.toSeq == want.toSeq,
        s"trainPpm=$trainPpm\n got=${got.toSeq}\nwant=${want.toSeq}")
    }
  }

  test("pearsonByKey: exact r/slope, null on zero variance, matches corr") {
    val rows =
      (1 to 50).map(i => ("lin", i.toDouble, 2.0 * i + 1.0)) ++        // r=1, slope=2
        (1 to 50).map(i => ("anti", i.toDouble, -3.0 * i)) ++          // r=-1, slope=-3
        (1 to 50).map(i => ("flat", 7.0, i.toDouble)) ++               // zero x-variance
        (1 to 50).map(i => ("mix", i.toDouble, ((i * 37) % 50).toDouble))
    val df = rows.toDF("k", "x", "y")
    val got = Rollups.pearsonByKey(df, "k", "x", "y")
      .as[(String, Long, Option[Double], Option[Double])]
      .collect().map(t => t._1 -> ((t._3, t._4))).toMap
    assert(math.abs(got("lin")._1.get - 1.0) < 1e-12)
    assert(math.abs(got("lin")._2.get - 2.0) < 1e-12)
    assert(math.abs(got("anti")._1.get + 1.0) < 1e-12)
    assert(got("flat") == ((None, None)))
    // agreement with Spark's native corr (double accumulation) to ~1e-10
    val native = df.where($"k" === "mix").agg(corr($"x", $"y")).head().getDouble(0)
    assert(math.abs(got("mix")._1.get - native) < 1e-10)
  }
}
