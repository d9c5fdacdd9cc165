package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance selection (Carbonell & Goldstein, SIGIR
  * 1998) — the canonical relevance-vs-redundancy greedy: pick the item
  * maximizing `λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)`, k times. The
  * training-data face: choosing k exemplar documents that are close to a
  * query/topic WITHOUT being near-duplicates of each other — the
  * diversified cousin of plain top-k retrieval (and of the coverage-greedy
  * [[SetCover]]).
  *
  * Split of labor (the q176/q172 bounded-driver-rounds posture):
  *  - DISTRIBUTED: scoring the whole corpus against the query (one
  *    broadcast pass, exact int8 dot products) and the top-`poolSize`
  *    selection (TakeOrdered — no global sort);
  *  - DRIVER: the greedy itself over the collected pool (poolSize·dim
  *    ints — a bounded collect). Greedy MMR is inherently sequential
  *    (each pick changes every remaining candidate's penalty), so the
  *    pool bound IS the scalability story: at 100 TB the corpus pass
  *    stays one scan and the driver cost is poolSize²·dim regardless of
  *    corpus size.
  *
  * Exactness: λ is a rational weight pair (`lambdaNum`/`lambdaDen`, e.g.
  * 7/10) so the objective `λNum·rel − (λDen−λNum)·maxsim` stays in exact
  * integer dot-product units; ties break on vec_id. Both engines replay
  * the identical argmax sequence — the oracle unrolls the k rounds.
  */
object Mmr {

  /** Greedy-select `k` of the top-`poolSize` most query-relevant vectors.
    * `quant` must be [[Similarity.quantizeInt8]] output (id, qvec);
    * `queryId` names the query vector (excluded from the pool).
    * Output: `(round, id, rel, max_sim, mmr_fp)` — one row per pick. */
  def mmrSelect(
      quant: DataFrame,
      idCol: String,
      queryId: Long,
      k: Int,
      poolSize: Int,
      lambdaNum: Long = 7L,
      lambdaDen: Long = 10L): DataFrame = {
    require(k >= 1 && k <= poolSize && poolSize <= 10000,
      "1 <= k <= poolSize <= 10000")
    require(lambdaNum >= 0 && lambdaNum <= lambdaDen && lambdaDen > 0,
      "lambda must be a rational in [0, 1]")
    val spark = quant.sparkSession
    val qvecRow = quant.filter(col(idCol) === queryId)
      .select(transform(col("qvec"), x => x.cast("long")).as("v"))
      .collect()
    require(qvecRow.length == 1, s"query vector $queryId not found")
    val qv = qvecRow(0).getSeq[Long](0).toArray

    // one corpus pass: exact integer dot against the broadcast query
    // (native codegen kernel, no per-element lambdas on the data-sized
    // stage), then TakeOrdered for the pool (never a global sort)
    val rel = quant.filter(col(idCol) =!= queryId)
      .select(col(idCol).cast("long").as("id"),
        transform(col("qvec"), x => x.cast("long")).as("v"))
      .withColumn("rel",
        graft.plans.GraftExtensions.dotLong(spark, col("v"), typedLit(qv.toSeq)))
    val pool = rel.orderBy(col("rel").desc, col("id")).limit(poolSize)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))

    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }

    val penalty = lambdaDen - lambdaNum
    val selected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val maxSim = scala.collection.mutable.Map.empty[Long, Long]
    val remaining = scala.collection.mutable.LinkedHashMap(
      pool.map(p => p._1 -> p): _*)
    var round = 1
    while (round <= k && remaining.nonEmpty) {
      // argmax of the exact integer objective, ties to the smaller id
      val best = remaining.valuesIterator.map { case (id, v, r) =>
        val ms = maxSim.getOrElse(id, 0L)
        (lambdaNum * r - penalty * ms, id, r, ms, v)
      }.reduceLeft { (a, b) =>
        if (b._1 > a._1 || (b._1 == a._1 && b._2 < a._2)) b else a
      }
      selected += Row(round, best._2, best._3, best._4, best._1)
      remaining.remove(best._2)
      remaining.valuesIterator.foreach { case (id, v, _) =>
        val s = dot(v, best._5)
        if (s > maxSim.getOrElse(id, Long.MinValue)) maxSim(id) = s
      }
      round += 1
    }
    spark.createDataFrame(
      java.util.Arrays.asList(selected.toArray: _*),
      StructType(Seq(
        StructField("round", IntegerType),
        StructField("id", LongType),
        StructField("rel", LongType),
        StructField("max_sim", LongType),
        StructField("mmr_fp", LongType))))
  }
}
