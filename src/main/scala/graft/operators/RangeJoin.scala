package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketized) range join — points matched to the intervals that
  * contain them: `keys` equal AND `start <= point <= end`. The canonical
  * shapes it serves: events→sessions, measurements→validity windows,
  * IPs→CIDR blocks, timestamps→SCD2 dimension versions.
  *
  * Reference analogue: the crisis-event day-range attribution
  * (`scripts/crisis_event_rollups.py` active-window logic) is a
  * point-in-interval membership test; this operator is that test as a
  * scalable join.
  *
  * Why not a raw non-equi join: Spark plans `p.ts BETWEEN i.s AND i.e`
  * (with only the key as equi-condition) fine for small inputs, but a hot
  * key degenerates to per-key points x intervals comparisons. The binned
  * formulation (Flink/Trino interval-join style) explodes each interval to
  * the fixed-width bins it covers (`sequence(floor(s/w), floor(e/w))`),
  * equi-joins on (keys, bin) — hash shuffle, AQE-eligible, codegen'd —
  * then applies the exact containment filter. Each (interval, bin) row is
  * unique and a point lives in exactly ONE bin, so a matched pair appears
  * exactly once: no post-join dedup.
  *
  * 100 TB posture: shuffle volume is O(points + intervals x avg_span/w).
  * Pick `binWidth` near the typical interval span: spans <= w explode to
  * at most 2 bins while keeping bin populations (the quadratic-comparison
  * bound within a join bucket) small. Long outlier intervals degrade
  * linearly (more replicas), never quadratically.
  *
  * Ordinates are Longs (day numbers, epoch seconds/micros, numeric ids);
  * callers map dates/timestamps down (e.g. `datediff(d, '1970-01-01')`) —
  * keeping the operator integral makes the bin arithmetic exact and
  * engine-portable.
  */
object RangeJoin {

  /** Inner range join: every (point row, interval row) pair on matching
    * `keys` with `startCol <= pointCol <= endCol`. Output columns: all of
    * `points`, then `intervals`' non-key columns.
    *
    * @param binWidth bin size in ordinate units (> 0); see scaladoc for
    *                 the span/width trade.
    */
  def pointsInIntervals(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!(intervals.columns ++ points.columns).contains("__bin"),
      "column name __bin is reserved")
    def bin(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val iCols = intervals.columns.filterNot(keys.contains)
    val collisions = iCols.toSet.intersect(points.columns.toSet)
    require(collisions.isEmpty,
      s"interval columns collide with point columns: $collisions")
    val binned = intervals.withColumn("__bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    points
      .withColumn("__bin", bin(col(pointCol)))
      .join(binned, keys :+ "__bin")
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }

  /** Inner interval-OVERLAP join: every (left row, right row) pair on
    * matching `keys` whose closed intervals intersect
    * (`lStart <= rEnd AND rStart <= lEnd`). The interval×interval
    * generalization of [[pointsInIntervals]] — attribution windows ×
    * influence windows, maintenance windows × incidents, SCD2 validity
    * overlap checks.
    *
    * Both sides explode to covered bins and equi-join on (keys, bin);
    * overlapping intervals share every bin the INTERSECTION covers, so
    * the pair is kept only in the intersection's FIRST bin
    * (`bin(greatest(lStart, rStart))` — a bin both sides provably cover):
    * each matched pair appears exactly once, no post-join dedup. Shuffle
    * volume is O(rows × avg_span/binWidth) per side; a hot key degrades
    * by bin population, never to per-key all-pairs. */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!(left.columns ++ right.columns).contains("__bin"),
      "column name __bin is reserved")
    def bin(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val collisions = right.columns.filterNot(keys.contains).toSet
      .intersect(left.columns.filterNot(keys.contains).toSet)
    require(collisions.isEmpty,
      s"right columns collide with left columns: $collisions")
    val lb = left.withColumn("__bin",
      explode(sequence(bin(col(leftStart)), bin(col(leftEnd)))))
    val rb = right.withColumn("__bin",
      explode(sequence(bin(col(rightStart)), bin(col(rightEnd)))))
    lb.join(rb, keys :+ "__bin")
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      .filter(col("__bin") === bin(greatest(col(leftStart), col(rightStart))))
      .drop("__bin")
  }
}
