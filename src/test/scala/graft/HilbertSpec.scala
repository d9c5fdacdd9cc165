package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Hilbert index kernels (q160): JVM xy2d replay, the adjacency property
  * that motivates the curve, and the locality win over Morton. */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  /** Reference xy2d straight from the standard quadrant-rotation
    * formulation (Wikipedia "Hilbert curve", converting to 1-D). */
  private def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("withHilbert2 matches the JVM replay on a full 16x16 grid") {
    val cells = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = Layout.withHilbert2(cells.toDF("x", "y"), "x", "y", bits = 4, "d")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    for ((x, y) <- cells)
      assert(got((x, y)) == xy2d(4, x, y), s"($x, $y)")
  }

  test("hilbert is a bijection with unit steps; morton jumps") {
    val n = 32L
    val cells = (for (x <- 0L until n; y <- 0L until n) yield (x, y)).toDF("x", "y")
    val h = Layout.withHilbert2(cells, "x", "y", bits = 5, "d")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(h.map(_._3).toSeq == (0L until n * n).toSeq, "indices must be a bijection")
    // the defining property: consecutive Hilbert cells are grid-adjacent
    for (Array(a, b) <- h.sliding(2).map(_.toArray))
      assert(math.abs(a._1 - b._1) + math.abs(a._2 - b._2) == 1L,
        s"non-unit step between $a and $b")
    // Morton on the same grid takes jumps > 1 (the quadrant seams)
    val z = cells.withColumn("d", Layout.zValue2(col("x"), col("y"), bits = 5))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    val zjumps = z.sliding(2)
      .map { case Array(a, b) => math.abs(a._1 - b._1) + math.abs(a._2 - b._2) }
    assert(zjumps.exists(_ > 1L), "morton should jump at quadrant seams")
  }

  test("withHilbert2 enforces the coordinate domain") {
    val bad = Seq((16L, 3L)).toDF("x", "y")
    val e = intercept[Exception] {
      Layout.withHilbert2(bad, "x", "y", bits = 4, "d").collect()
    }
    assert(e.getMessage != null)
  }

  test("hilbert total walk beats morton on the real cell grid") {
    val cells = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_suppkey").as("cx"), col("l_partkey").as("cy")).distinct()
    def walk(indexed: Seq[(Long, Long, Long)]): Long =
      indexed.sortBy(_._3).sliding(2).map {
        case Seq(a, b) => math.abs(a._1 - b._1) + math.abs(a._2 - b._2)
        case _ => 0L
      }.sum
    val h = walk(Layout.withHilbert2(cells, "cx", "cy", 16, "d")
      .as[(Long, Long, Long)].collect().toSeq)
    val z = walk(cells.withColumn("d", Layout.zValue2(col("cx"), col("cy"), 16))
      .as[(Long, Long, Long)].collect().toSeq)
    assert(h < z, s"hilbert walk $h should beat morton $z")
  }
}
