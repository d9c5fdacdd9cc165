package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Session extensions for graft's native expressions.
  *
  * Two registration paths:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  *    (the standard SparkSessionExtensions route), or
  *  - `GraftExtensions.ensureRegistered(spark)` for an existing session
  *    (idempotent temp-function registration) — used by the operators so a
  *    vanilla session still gets the codegen'd path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_md5h60"),
      new ExpressionInfo(classOf[Md5Hash60].getName, "graft_md5h60"),
      (children: Seq[Expression]) => Md5Hash60(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_nearest_centroid"),
      new ExpressionInfo(classOf[NearestCentroid].getName, "graft_nearest_centroid"),
      (children: Seq[Expression]) => NearestCentroid(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_sorted_intersect"),
      (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot_long"),
      new ExpressionInfo(classOf[DotLong].getName, "graft_dot_long"),
      (children: Seq[Expression]) => DotLong(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))
  }
}

object GraftExtensions {

  /** Idempotently register graft functions on an existing session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier("graft_cosine"))) {
      registry.createOrReplaceTempFunction("graft_cosine",
        (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)),
        "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_md5h60"))) {
      registry.createOrReplaceTempFunction("graft_md5h60",
        (children: Seq[Expression]) => Md5Hash60(children.head),
        "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_nearest_centroid"))) {
      registry.createOrReplaceTempFunction("graft_nearest_centroid",
        (children: Seq[Expression]) => NearestCentroid(children(0), children(1)),
        "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_sorted_intersect"))) {
      registry.createOrReplaceTempFunction("graft_sorted_intersect",
        (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1)),
        "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_dot_long"))) {
      registry.createOrReplaceTempFunction("graft_dot_long",
        (children: Seq[Expression]) => DotLong(children(0), children(1)),
        "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_bloom_might_contain"))) {
      registry.createOrReplaceTempFunction("graft_bloom_might_contain",
        (children: Seq[Expression]) =>
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            children(0), children(1)),
        "built-in")
    }
  }

  /** Column-API handle for the native cosine (registers on first use). */
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_cosine", a, b)
  }

  /** Column-API handle for the native exact `array<long>` dot product
    * (the int8-quantized domain; ANSI — overflow throws). */
  def dotLong(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_dot_long", a, b)
  }

  /** Column-API handle for the native sorted-array intersection count:
    * both arrays must be sorted ascending and duplicate-free. */
  def sortedIntersect(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_sorted_intersect", a, b)
  }

  /** Column-API handle for the native nearest-centroid argmax: `matrix`
    * must be a foldable `array<array<float>>` of centroid literals. */
  def nearestCentroid(spark: SparkSession, vec: Column, matrix: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_nearest_centroid", vec, matrix)
  }
}
