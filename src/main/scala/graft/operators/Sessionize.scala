package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization as an incrementally-maintainable operator family.
  *
  * q54 builds sessions one-shot (`session_window` / the lag+cumsum
  * islands). At 100 TB the event stream arrives in daily batches and
  * re-sessionizing history per batch is the cost this module removes:
  * sessionize each batch alone, then MERGE the session-grain fragments —
  * two sessions of one user fuse iff the later one starts within the
  * inactivity gap of the earlier one's end. Session aggregates are
  * sums/min/max, so fusion needs only the session rows, never the
  * events.
  *
  * Contract (the [[Funnel.updateFunnelState]] ordered-batch posture):
  * batches arrive in event-time order — every event in a batch is later
  * than every event already folded into the state. Then the only
  * fusable pair per user is (state's last session, batch's first
  * session), and the general gap-sweep handles exactly that; the fold
  * telescopes to the one-shot session table (q112 hash-proves it against
  * q54's oracle). Late events belong to a bounded recompute of their
  * day, not to this path.
  *
  * Scale shape: per batch, one Exchange on the user key (the batch is
  * the only thing windowed at the EVENT grain); the merge windows only
  * the session-grain state — rows per user = sessions, not events. */
object Sessionize {

  /** Sessions from one event batch at the µs grain: a gap of `gapUs` or
    * more opens a new session (q54's exact split criterion). Output:
    * `(userCol, session_start_us, session_end_us, n_events,
    * n_purchases)` — `n_purchases` counts rows matching `purchaseCond`. */
  def sessionize(
      events: DataFrame,
      userCol: String,
      tsUsCol: String,
      gapUs: Long,
      purchaseCond: Column): DataFrame = {
    require(gapUs > 0, "gap must be positive")
    require(!events.columns.exists(c => c.startsWith("__ss_")),
      "input must not contain reserved internal columns __ss_*")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsUsCol))
    events
      .where(col(userCol).isNotNull && col(tsUsCol).isNotNull)
      .withColumn("__ss_pd", lag(col(tsUsCol), 1).over(w))
      .withColumn("__ss_open",
        when(col("__ss_pd").isNull ||
          col(tsUsCol) - col("__ss_pd") >= gapUs, 1L).otherwise(0L))
      .withColumn("__ss_sid",
        sum(col("__ss_open"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__ss_sid"))
      .agg(
        min(col(tsUsCol)).as("session_start_us"),
        max(col(tsUsCol)).as("session_end_us"),
        count(lit(1)).as("n_events"),
        Rollups.countIf(purchaseCond).as("n_purchases"))
      .drop("__ss_sid")
  }

  /** Fuse session fragments: the [[Windows.intervalUnion]] cummax sweep
    * with a gap-extended criterion — a fragment opens a new session iff
    * its start is at least `gapUs` past the running max of prior ends.
    * Aggregates sum; start/end take min/max. Input/output are both
    * [[sessionize]]-shaped. */
  def mergeFragments(frags: DataFrame, userCol: String, gapUs: Long): DataFrame = {
    require(!frags.columns.exists(c => c.startsWith("__ss_")),
      "input must not contain reserved internal columns __ss_*")
    val byKey = Window.partitionBy(col(userCol))
      .orderBy(col("session_start_us"), col("session_end_us"))
    val pmax = max(col("session_end_us"))
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    frags
      .withColumn("__ss_open",
        when(pmax.isNull ||
          col("session_start_us") - pmax >= gapUs, 1L).otherwise(0L))
      .withColumn("__ss_gid",
        sum(col("__ss_open"))
          .over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__ss_gid"))
      .agg(
        min(col("session_start_us")).as("session_start_us"),
        max(col("session_end_us")).as("session_end_us"),
        sum(col("n_events")).as("n_events"),
        sum(col("n_purchases")).as("n_purchases"))
      .drop("__ss_gid")
  }

  /** Ordered-batch incremental update: fold a new batch's sessions into
    * the state. `state` is [[sessionize]]-shaped (pass `limit(0)`-empty
    * to start); returns the same shape. */
  def updateSessionState(
      state: DataFrame,
      batchSessions: DataFrame,
      userCol: String,
      gapUs: Long): DataFrame =
    mergeFragments(state.unionByName(batchSessions), userCol, gapUs)
}
