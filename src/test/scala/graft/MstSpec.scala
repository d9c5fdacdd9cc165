package graft

import graft.operators.{Dedup, Mst}
import org.apache.spark.sql.functions._

/** Borůvka MSF: hand cases, a Kruskal differential under the same
  * (w, u, v) total order, and the single-linkage threshold property. */
class MstSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Kruskal with union-find under the identical total order —
    * the unique MSF of the lexicographically-perturbed weights. */
  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2), e._3))
      .groupBy(e => (e._1, e._2)).map { case (_, es) => es.minBy(_._3) }.toSeq
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val out = Set.newBuilder[(Long, Long, Long)]
    canon.sortBy(e => (e._3, e._1, e._2)).foreach { case (u, v, w) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { parent(ru) = rv; out += ((u, v, w)) }
    }
    out.result()
  }

  private def boruvka(edges: Seq[(Long, Long, Long)]) =
    Mst.boruvkaMsf(edges.toDF("u", "v", "w"), "u", "v", "w")
      .as[(Long, Long, Long)].collect().toSet

  test("mst: hand case — square plus diagonal") {
    val e = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L), (4L, 1L, 3L), (1L, 3L, 5L))
    assert(boruvka(e) == Set((1L, 2L, 1L), (3L, 4L, 1L), (2L, 3L, 2L)))
  }

  test("mst: parallel edges, self-loops, and both orientations collapse") {
    val e = Seq((1L, 2L, 5L), (2L, 1L, 3L), (1L, 1L, 0L), (2L, 3L, 4L), (3L, 2L, 7L))
    assert(boruvka(e) == Set((1L, 2L, 3L), (2L, 3L, 4L)))
  }

  test("mst: disconnected graph yields a forest, one tree per component") {
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L), (10L, 11L, 2L))
    val got = boruvka(e)
    assert(got.size == 3)
    assert(got == kruskal(e))
  }

  test("mst: Kruskal differential on a pseudo-random graph with ties") {
    // deterministic weights with many collisions — the (w, u, v) order is
    // what makes the forest unique
    val e = for {
      u <- 1L to 40L
      v <- (u + 1) to math.min(u + 7, 40L)
    } yield (u, v, (u * 31 + v * 17) % 5)
    assert(boruvka(e) == kruskal(e))
  }

  test("mst: deterministic across repartitionings") {
    val e = (1L to 200L).flatMap(u =>
      Seq((u, u % 97 + 201L, (u * 13) % 11), (u, (u * 7) % 150 + 1L, (u * 29) % 11)))
    val df = e.toDF("u", "v", "w")
    val a = Mst.boruvkaMsf(df, "u", "v", "w").as[(Long, Long, Long)].collect().toSet
    val b = Mst.boruvkaMsf(df.repartition(13), "u", "v", "w")
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("mst: thresholded forest components == thresholded graph components") {
    val e = for {
      u <- 1L to 60L
      v <- (u + 1) to math.min(u + 5, 60L)
    } yield (u, v, (u * 31 + v * 17) % 7)
    val msf = Mst.boruvkaMsf(e.toDF("u", "v", "w"), "u", "v", "w")
    for (tau <- Seq(1L, 3L, 5L)) {
      val viaMsf = Dedup.connectedComponents(
          msf.filter(col("w") <= tau), "u", "v")
        .as[(Long, Long)].collect().toSet
      val direct = Dedup.connectedComponents(
          e.filter(_._3 <= tau).map(x => (x._1, x._2)).toDF("u", "v"), "u", "v")
        .as[(Long, Long)].collect().toSet
      assert(viaMsf == direct, s"threshold $tau")
    }
  }
}
