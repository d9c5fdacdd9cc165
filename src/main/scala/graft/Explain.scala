package graft
import org.apache.spark.sql.SparkSession

/** Formatted-plan dumper: writes `.explain("formatted")` output for the
  * named queries to `<outDir>/<query>_<tag>.txt` — the optimization
  * rounds' plan-evidence artifact (plans/r12/...). Uses the same session
  * profile as Bench so Exchange counts / join strategies match what the
  * bench actually executes.
  *
  * Usage: runMain graft.Explain <outDir> <tag> <query1> [query2 ...]
  *        (query "all" dumps every registered query)
  * Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *        SPARK_GRAFT_CPUS (default 32).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/root/repo/plans/r12")
    val tag = if (args.length > 1) args(1) else "before"
    val names: Seq[String] =
      if (args.length > 2 && args(2) != "all") args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (q <- names) {
      SparkEntry.queries.get(q) match {
        case Some(fn) =>
          try {
            val df = fn(spark, dir)
            // queryExecution.explainString(FormattedMode) == df.explain("formatted")
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$outDir/${q}_$tag.txt"),
              txt.getBytes("UTF-8"))
            val nEx = "(?m)^.*Exchange".r.findAllIn(txt).size
            println(s"[explain] $q -> $outDir/${q}_$tag.txt (Exchange nodes: $nEx)")
          } catch { case e: Throwable =>
            System.err.println(s"[explain] $q FAILED: ${e.getMessage}")
          }
        case None => System.err.println(s"[explain] unknown query: $q")
      }
    }
    spark.stop()
  }
}
