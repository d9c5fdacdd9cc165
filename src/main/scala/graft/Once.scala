package graft

/** Dev timing harness: run named queries against one sf dir a few times and
  * print per-run wall times — the single-query iteration loop Bench's full
  * warmup + min-of-3 + sf1 + sf10 sweep is too slow for.
  *
  * Usage: `runMain graft.Once <sfDir> <reps> <query> [<query> ...]`
  */
object Once {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(
        f"[once] $name%-26s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
