package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/val/test assignment — the split that must NEVER
  * move a document between splits when the corpus grows (eval contamination
  * by reassignment is invisible and catastrophic: yesterday's train doc in
  * today's test set).
  *
  * Assignment is a pure function of the document id: the portable md5-60
  * hash of `salt || id` reduced to a parts-per-million bucket, compared
  * against integer ppm thresholds (the [[Mixing]] idiom — no float
  * fractions, no engine-specific rounding, replayable in any engine with
  * md5). Zero shuffles: the split column is a per-row projection; stability
  * under corpus growth holds because nothing about other rows enters the
  * hash. The salt isolates split families (changing the salt is a fresh
  * independent split; reusing a salt reproduces the old one exactly).
  */
object Splits {

  /** ppm denominator: buckets are `pmod(hash, 1e6)`. */
  val Ppm: Long = 1000000L

  /** Assign each row a named split. `splits` are (name, ppm) pairs that
    * must sum to exactly 1,000,000 — integer ppm, not float fractions, so
    * the thresholds are the same in every engine. Appends `bucket` (the
    * row's ppm draw) and `split`. */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Long)],
      salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "positive ppm shares")
    require(splits.map(_._2).sum == Ppm,
      s"ppm shares must sum to $Ppm, got ${splits.map(_._2).sum}")
    require(!df.columns.contains("bucket") && !df.columns.contains("split"),
      "input must not already contain bucket/split")
    val bucket = pmod(
      PortableHash.md5Hash60(concat(lit(salt), lit(":"), col(idCol).cast("string"))),
      lit(Ppm))
    val cuts = splits.scanLeft(0L)(_ + _._2).tail // cumulative upper bounds
    val assign = splits.zip(cuts).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), hi)) =>
        coalesce(acc, when(col("bucket") < hi, lit(name)))
    }
    df.withColumn("bucket", bucket).withColumn("split", assign)
  }

  /** The same bucket expression as a DuckDB SQL fragment, for oracles.
    * Plain `%` suffices: the md5-60 hash is non-negative by construction,
    * so sign-following and positive modulo agree. */
  def bucketSql(idExpr: String, salt: String = "split"): String =
    s"(${PortableHash.md5Hash60Sql(s"'$salt:' || CAST($idExpr AS VARCHAR)")} % ${Ppm})"
}
