package graft

import graft.operators.Triangles
import org.apache.spark.sql.functions._

/** Degree-ordered triangle counting: exact census vs brute force. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def census(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Triangles.nodeTriangles(edges.toDF("a", "b"), "a", "b")
      .select("node", "degree", "triangles")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("K4 yields 4 triangles, 3 per node, clustering 1.0") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val out = Triangles.nodeTriangles(k4.toDF("a", "b"), "a", "b")
      .select("node", "degree", "triangles", "clustering")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 3L, 3L, 1.0), (2L, 3L, 3L, 1.0), (3L, 3L, 3L, 1.0), (4L, 3L, 3L, 1.0)))
  }

  test("path graph has zero triangles; isolated-in-graph degree-1 nodes get 0.0") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val out = Triangles.nodeTriangles(path.toDF("a", "b"), "a", "b")
      .agg(sum("triangles"), sum(when(col("clustering") =!= 0.0, 1).otherwise(0)))
      .as[(Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 0L)))
  }

  test("hub-and-spoke plus one rim edge: exactly one triangle at 3 nodes") {
    // hub 100 connected to 1..10, rim edge (1,2): triangle (100,1,2) only
    val edges = (1L to 10L).map(i => (i, 100L)) :+ ((1L, 2L))
    val got = census(edges)
    assert(got(100L) == (10L, 1L) && got(1L) == (2L, 1L) && got(2L) == (2L, 1L))
    assert((3L to 10L).forall(i => got(i) == (1L, 0L)))
  }

  test("random graph matches brute-force enumeration") {
    val rnd = new scala.util.Random(7)
    val edges = (for (a <- 1L to 30L; b <- (a + 1) to 30L if rnd.nextDouble() < 0.2)
      yield (a, b)).toSeq
    val eset = edges.toSet
    val brute = (for {
      (a, b) <- edges; c <- (b + 1) to 30L
      if eset.contains((b, c)) && eset.contains((a, c))
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).map { case (n, l) => n -> l.size.toLong }
    val got = census(edges).collect { case (n, (_, t)) if t > 0 => n -> t }.toMap
    assert(got == brute)
  }

  test("reserved columns are rejected") {
    intercept[IllegalArgumentException] {
      Triangles.nodeTriangles(Seq((1L, 2L)).toDF("u", "v"), "u", "v")
    }
  }
}
