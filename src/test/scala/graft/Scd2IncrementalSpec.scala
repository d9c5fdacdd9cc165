package graft

import java.nio.file.Files

import graft.operators.Scd2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental SCD2 maintenance must equal a from-scratch rebuild — in
  * particular under LATE-arriving changes that land inside collapsed
  * history (the case an interval-replay shortcut gets wrong) — and the
  * physical bucket refresh must leave untouched partitions byte-stable. */
class Scd2IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val keys = Seq("k")

  test("refreshKeys == full rebuild, incl. late data resurrecting a collapsed state") {
    // u1: (1,A),(4,A) collapse to one interval at t=1; the late (2,B) must
    // split it into A[1,2) B[2,4) A[4,∞) — only the log still knows about
    // the collapsed (4,A) row
    val log0 = Seq(("u1", 1L, "A"), ("u1", 4L, "A"), ("u2", 3L, "X")).toDF("k", "t", "st")
    val existing = Scd2.buildIntervals(log0, keys, "t", Seq("st"))
    val batch = Seq(("u1", 2L, "B")).toDF("k", "t", "st")
    val log1 = log0.unionByName(batch)

    val inc = Scd2.refreshKeys(existing, log1, batch, keys, "t", Seq("st"))
    val full = Scd2.buildIntervals(log1, keys, "t", Seq("st"))
    assert(canon(inc) == canon(full))
    assert(inc.filter(col("k") === "u1").count() == 3)

    // randomized: repeated appends (in- and out-of-order) stay rebuild-equal
    val rnd = new scala.util.Random(13)
    var log = (1 to 200).map(_ =>
      (s"u${rnd.nextInt(8)}", rnd.nextInt(50).toLong, s"s${rnd.nextInt(3)}"))
      .toDF("k", "t", "st")
    var cur = Scd2.buildIntervals(log, keys, "t", Seq("st"))
    for (_ <- 1 to 3) {
      val b = (1 to 30).map(_ =>
        (s"u${rnd.nextInt(10)}", rnd.nextInt(60).toLong, s"s${rnd.nextInt(3)}"))
        .toDF("k", "t", "st")
      log = log.unionByName(b)
      cur = Scd2.refreshKeys(cur, log, b, keys, "t", Seq("st"))
      assert(canon(cur) == canon(Scd2.buildIntervals(log, keys, "t", Seq("st"))))
    }
  }

  test("refreshKeys plan: untouched rows pass through without a window") {
    val log = Seq(("u1", 1L, "A"), ("u2", 2L, "B")).toDF("k", "t", "st")
    val existing = Scd2.buildIntervals(log, keys, "t", Seq("st"))
      .localCheckpoint() // materialized gold table stand-in
    val batch = Seq(("u1", 3L, "C")).toDF("k", "t", "st")
    val plan = Scd2.refreshKeys(existing, log.unionByName(batch), batch, keys, "t", Seq("st"))
      .queryExecution.optimizedPlan.toString
    // the existing side is anti-join + scan only: the plan's Window
    // operators all belong to the touched-keys rebuild (a lone
    // buildIntervals plans the same 3 passes)
    val rebuildOnly = Scd2.buildIntervals(log, keys, "t", Seq("st"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Join LeftAnti"), plan.take(2000))
    assert("Window \\[".r.findAllIn(plan).size ==
      "Window \\[".r.findAllIn(rebuildOnly).size,
      "untouched side must not recompute intervals:\n" + plan.take(2000))
  }

  test("bucket refresh: incremental == rebuild, untouched bucket files byte-stable") {
    val base = Files.createTempDirectory("graft-scd2").toString + "/intervals"
    val log0 = (1 to 400).map { i =>
      (s"u${i % 40}", (i / 7).toLong, s"s${i % 3}")
    }.toDF("k", "t", "st")
    // initial full build: every key is "touched"
    Scd2.refreshBucketsToParquet(base, log0, log0, keys, "t", Seq("st"), nBuckets = 8)

    def fileStates: Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(base)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = fileStates

    val batch = Seq(("u7", 1000L, "s9")).toDF("k", "t", "st")
    val log1 = log0.unionByName(batch)
    Scd2.refreshBucketsToParquet(base, log1, batch, keys, "t", Seq("st"), nBuckets = 8)

    val touchedBucket = batch.select(Scd2.bucketOf(keys, 8)).collect()(0).getInt(0)
    val touchedPrefix = s"__bucket=$touchedBucket"
    val after = fileStates
    before.filterNot(_._1.contains(touchedPrefix)).foreach { case (p, m) =>
      assert(after.get(p).contains(m), s"untouched bucket file rewritten: $p")
    }

    val reread = spark.read.parquet(base).drop("__bucket")
    assert(canon(reread) == canon(Scd2.buildIntervals(log1, keys, "t", Seq("st"))))
  }
}
