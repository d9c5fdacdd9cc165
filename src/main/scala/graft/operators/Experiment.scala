package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment readout with CUPED variance reduction (Deng, Xu, Kohavi &
  * Walker, WSDM'13 — "Controlled experiments by utilizing pre-experiment
  * data", the industry-standard A/B readout adjustment): the post-period
  * metric is adjusted by its pre-period covariate,
  *
  *   y_adj = y - θ·(x - x̄),  θ = Cov(x, y) / Var(x)  (pooled),
  *
  * which leaves group-difference estimates unbiased (θ is computed on the
  * pooled population, independent of assignment) and removes the variance
  * the covariate explains.
  *
  * Exactness policy: x and y are fixed-point metrics recovered as scaled
  * longs (the [[Rollups.exactMoneySum]] move), all second moments are
  * exact integer sums carried in decimal(38,0), and doubles appear only in
  * the FINAL scalar formulas — one fixed expression tree, so any engine
  * replays θ and the adjusted means bit-for-bit. Shape: one shuffle to the
  * user grain, one global and one per-group aggregate — nothing downstream
  * of the user grain grows with event volume.
  */
object Experiment {

  /** CUPED readout over per-user rows `(grpCol, xCents, yCents)` (longs —
    * pre/post metric in fixed-point units). Output: one row per group —
    * `(grp, n_users, mean_pre, mean_post, mean_adjusted, theta)`, means in
    * metric units (cents/10²), theta pooled and repeated per row. */
  def cupedReadout(
      perUser: DataFrame,
      grpCol: String,
      xCentsCol: String,
      yCentsCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val x = col(xCentsCol).cast(d38)
    val y = col(yCentsCol).cast(d38)
    val g = perUser.agg(
      count(lit(1)).cast(d38).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum((col(xCentsCol).cast("decimal(19,0)") *
        col(yCentsCol).cast("decimal(19,0)")).cast(d38)).as("sxy"),
      sum((col(xCentsCol).cast("decimal(19,0)") *
        col(xCentsCol).cast("decimal(19,0)")).cast(d38)).as("sxx"))
      .select(
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("theta"),
        (col("sx").cast("double") / col("n").cast("double")).as("mx_all"))

    val per = perUser.groupBy(col(grpCol).as("grp"))
      .agg(count(lit(1)).as("n_users"),
        sum(x).as("sxg"), sum(y).as("syg"))
      .crossJoin(broadcast(g))
    per.select(
      col("grp"), col("n_users"),
      (col("sxg").cast("double") / col("n_users").cast("double") / lit(100.0))
        .as("mean_pre"),
      (col("syg").cast("double") / col("n_users").cast("double") / lit(100.0))
        .as("mean_post"),
      ((col("syg").cast("double") / col("n_users").cast("double") -
        col("theta") *
          (col("sxg").cast("double") / col("n_users").cast("double") -
            col("mx_all"))) / lit(100.0)).as("mean_adjusted"),
      col("theta"))
  }
}
