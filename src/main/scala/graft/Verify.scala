package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd+ args: only dump queries whose name contains ANY of the
    // substrings (local iteration aid; the driver always runs the full set)
    val nameFilters = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    new java.io.File(outDir).mkdirs()
    // Failures must be loud IN THE ARTIFACT, not just on stderr: a query
    // that throws gets (a) an _ERROR.txt marker inside its output dir — the
    // driver's parquet read of that dir then fails and records an err row
    // instead of silently dropping the query — and (b) a row in errors.json,
    // so the artifact's accounting always covers the full declared registry
    // (round 6 shipped 91 silent greens for a 91/115 suite).
    val errors = SparkEntry.queries
      .filter { case (name, _) =>
        nameFilters.isEmpty || nameFilters.exists(name.contains) }
      .toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        // marker line BEFORE the run: engine warnings that follow in the
        // log attribute to this query (how the WindowExec-warning audit
        // finds its offenders)
        System.err.println(s"[verify] running $name")
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          None
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          val dir = new java.io.File(s"$outDir/$name")
          dir.mkdirs()
          Files.writeString(Paths.get(s"$outDir/$name/_ERROR.txt"),
            s"$name failed:\n${e}\n")
          Some(name -> String.valueOf(e.getMessage).take(500))
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: " +
        errors.map(_._1).mkString(", "))
    spark.stop()
  }
}
