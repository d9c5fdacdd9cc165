package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  override def afterAll(): Unit = () // shared session; stopped by JVM exit
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same default posture as Sessions.local: config-based native
      // function registration, so newSession() children resolve them too
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // see Sessions.local: keep lit(0) window partition keys (the
      // bounded-domain annotation) from being folded back into anonymous
      // no-partition warnings
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
