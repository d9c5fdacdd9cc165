package graft

import graft.functions.{SimilarityFunctions => SF}
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

class PlansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = (1L to 200L).map { i =>
    (i, Array.tabulate(16)(j => math.sin(i * 31 + j).toFloat))
  }.toDF("vec_id", "embedding")

  test("native graft_cosine matches the HOF formulation within float tolerance") {
    // not bit-identical by design: zip_with multiplies in FLOAT, the native
    // expression promotes to double per element (strictly more precise)
    val paired = vecs.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(vecs.select(col("embedding").as("b")).limit(5))
    val both = paired.select(
      GraftExtensions.cosine(spark, col("a"), col("b")).as("native"),
      SF.cosine(col("a"), col("b")).as("hof"))
    val maxDiff = both.select(max(abs(col("native") - col("hof")))).collect()(0).getDouble(0)
    assert(maxDiff < 1e-6)
  }

  test("native cosine handles zero vectors and null arrays") {
    val df = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)),
      (Array(1.0f, 1.0f), Array(1.0f, 1.0f))
    ).toDF("a", "b")
      .select(GraftExtensions.cosine(spark, col("a"), col("b")).as("c"))
    val got = df.as[Double].collect()
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    val withNull = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(GraftExtensions.cosine(spark, col("a"), col("b")).as("c"))
    assert(withNull.collect()(0).isNullAt(0))
  }

  test("cosine scan stays inside WholeStageCodegen") {
    // a parquet-backed scan (local relations collapse to LocalTableScan)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = emb.select(GraftExtensions.cosine(spark, col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen stage; a CodegenFallback
    // expression would strip it from the Project
    assert(plan.contains("*(1) Project"))
  }

  test("native md5h60 == conv(substring(md5)) formulation, and stays codegen'd") {
    val rnd = new scala.util.Random(7)
    val samples = Seq("", "a", "hello world", "héllo ünïcode ✓",
      "x" * 500, "0", "\t\n") ++
      (1 to 200).map(_ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
    val df = samples.toDF("s")
    val both = df.select(
      graft.functions.PortableHash.md5Hash60(col("s")).as("native"),
      conv(substring(md5(col("s").cast("binary")), 2, 15), 16, 10)
        .cast("long").as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
    assert(both.filter(col("native") < 0).count() == 0, "60-bit => positive")
    // parquet-backed scan stays inside one WholeStageCodegen span
    val doc = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = doc.select(graft.functions.PortableHash.md5Hash60(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"))
  }

  test("SparkSessionExtensions route registers graft_cosine") {
    val s2 = spark.newSession()
    new graft.plans.GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions) // constructs cleanly
    GraftExtensions.ensureRegistered(s2)
    val r = s2.sql("SELECT graft_cosine(array(cast(1.0 as float)), array(cast(1.0 as float)))")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
