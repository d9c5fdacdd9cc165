package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EWMA control chart (Roberts 1959; the EWMA/Hampel screen every
  * metrics pipeline runs before alerting): per key, in event order,
  *
  *   e_t = (a·v_t + (1-a)·e_{t-1}),   d_t = (a·|r_t| + (1-a)·d_{t-1})
  *
  * where `r_t = v_t - e_{t-1}` is the one-step-ahead residual and a row
  * is a spike when `|r_t| > k · d_{t-1}` (deviation state BEFORE the
  * update, so a spike cannot mask itself).
  *
  * Arithmetic is FIXED-POINT INTEGER: values arrive pre-scaled to longs
  * (e.g. `floor(value · 1e6)` micros) and the smoothing factor is the
  * rational `num/den`; each update is one multiply-add and one TRUNCATING
  * long division — bit-exact, order-deterministic, and replayable in any
  * engine with 64-bit integers (the repo's float-parity policy: no
  * accumulated double rounding, no pow underflow at long horizons).
  *
  * Scale shape: the recursion is the textbook case where a window
  * function cannot help (`e_t` references itself), so the operator ships
  * the strongest distributed form: ONE shuffle (`repartition` on the
  * keys) + `sortWithinPartitions` + a streaming `mapPartitions` fold with
  * O(1) state per key — no group buffering at all, a key's series may be
  * arbitrarily long and never lives in memory (contrast
  * [[StatePropagation.propagateActive]], whose per-group sort is fine
  * there because daily-grain groups are bounded by the date range).
  *
  * Output = input columns + `rn` (1-based position in key order),
  * `ewma`, `dev` (both post-update, same fixed-point scale), `resid`
  * (pre-update residual, null on each key's first row), `is_spike`.
  */
object ControlChart {

  def ewmaChart(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[String],
      valCol: String,
      alphaNum: Long = 1L,
      alphaDen: Long = 4L,
      spikeK: Long = 3L): DataFrame = {
    require(alphaNum > 0 && alphaDen > alphaNum,
      s"alpha must be a proper positive fraction, got $alphaNum/$alphaDen")
    require(spikeK > 0, s"spikeK must be positive, got $spikeK")
    val reserved = Set("rn", "ewma", "dev", "resid", "is_spike")
    require(!df.columns.exists(reserved),
      s"df must not contain reserved output columns ${reserved.mkString("/")}")

    val inSchema = df.schema
    require(inSchema(valCol).dataType == LongType,
      s"$valCol must be LongType (pre-scale doubles with floor(v * scale))")
    val outSchema = inSchema
      .add("rn", LongType, nullable = false)
      .add("ewma", LongType, nullable = false)
      .add("dev", LongType, nullable = false)
      .add("resid", LongType, nullable = true)
      .add("is_spike", BooleanType, nullable = false)
    val keyIdx = keys.map(inSchema.fieldIndex)
    val valIdx = inSchema.fieldIndex(valCol)
    val outEnc = RowEncoder.encoderFor(outSchema)
    val (num, den, k) = (alphaNum, alphaDen, spikeK)

    df.repartition(keys.map(col): _*)
      .sortWithinPartitions((keys ++ order).map(col): _*)
      .mapPartitions { rows =>
        var curKey: Seq[Any] = null
        var rn = 0L
        var e = 0L
        var d = 0L
        rows.map { r =>
          val rKey = keyIdx.map(r.get)
          val v = r.getLong(valIdx)
          if (curKey == null || rKey != curKey) {
            curKey = rKey; rn = 1L; e = v; d = 0L
            Row.fromSeq(r.toSeq :+ rn :+ e :+ d :+ null :+ false)
          } else {
            rn += 1L
            val resid = v - e
            val spike = d > 0L && math.abs(resid) > k * d
            e = (num * v + (den - num) * e) / den
            d = (num * math.abs(resid) + (den - num) * d) / den
            Row.fromSeq(r.toSeq :+ rn :+ e :+ d :+ resid :+ spike)
          }
        }
      }(outEnc)
      .toDF(outSchema.fieldNames.toIndexedSeq: _*)
  }
}
