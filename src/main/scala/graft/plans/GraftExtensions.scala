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
  }

  /** Column-API handle for the native cosine (registers on first use). */
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_cosine", a, b)
  }
}
