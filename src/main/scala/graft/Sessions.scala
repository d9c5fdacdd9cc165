package graft

import org.apache.spark.sql.SparkSession

/** Session configuration in one place — the local test/bench profile the
  * repo's mains use, and the documented cluster profile this library is
  * designed to run under at 100 TB.
  *
  * The settings are part of the engine's contract (several queries depend
  * on them for correctness, not just speed), so they live in code rather
  * than scattered notes:
  *  - `spark.sql.session.timeZone=UTC` — date bucketing of timestamps
  *    must agree with the DuckDB oracle, AND `Tables.events` relies on it
  *    when normalizing a TIMESTAMP_NTZ `ts` column to epoch nanos (the
  *    NTZ→LTZ cast reads wall time in the session zone). The old
  *    `nanosAsLong` escape hatch is gone: Spark 4.1.2 no longer honors it
  *    for TIMESTAMP(NANOS) parquet, and current testdata is timestamp[us]
  *    anyway — dtype dispatch in `Tables.events` covers both.
  *  - ANSI mode stays ON (Spark 4 default): overflow throws instead of
  *    wrapping, which is why all hash arithmetic in the library is
  *    pmod/decimal-ranged by construction.
  */
object Sessions {

  /** Local profile: `local[cores]`, shuffle partitions = cores (not the
    * 200 default — at sf0.1 a 200-way shuffle is pure task overhead), AQE
    * on, UI off, and the graft native functions installed CONFIG-BASED
    * (`spark.sql.extensions`) — the same posture as [[clusterConf]], so
    * `newSession()` children resolve graft_md5h60/graft_cosine from their
    * own registries and the PortableHash single-session caveat never
    * applies under a profile session. Used by Verify/Bench and mirrored by
    * the test harness. */
  def local(cores: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // typed-Aggregator aggregations (BoundedTopKPairs and friends) fall
      // back to SORT-BASED aggregation after 128 distinct groups per task
      // by default — which silently re-introduces the full candidate-table
      // sort those aggregators exist to avoid. Buffers here are O(k), so
      // a large in-memory group map is the right trade at every scale.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 22).toString)
      // A constant window partition key (Window.partitionBy(lit(0))) is
      // this library's EXPLICIT annotation that a single-partition window
      // over a provably bounded domain is intentional (calibration bins,
      // bucket carries, top-k survivors, day spines...). Spark 4's
      // EliminateWindowPartitions folds the literal away, turning every
      // annotated site back into an anonymous "No Partition Defined"
      // warning indistinguishable from a genuine scale mistake. Excluding
      // the rule keeps the annotation (identical execution: one hash
      // partition) and keeps the warning meaningful — it now fires ONLY
      // on unannotated, potentially-unbounded windows.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions")
      // The whole-stage-codegen class cache holds 100 compiled plans by
      // default (static conf) — a 232-query suite churns it, so by the
      // time a long-lived JVM re-executes a plan its generated class has
      // been evicted and every execution pays Janino recompilation (the
      // literal-heavy band-LSH plans pay seconds: q33's sf1 samples read
      // 11-16 s mid-suite vs 3.3 s isolated). Hold every plan of a full
      // suite pass instead; entries are compiled classes, O(10 KB) each.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Cluster profile for a real deployment (documented here, applied by
    * the site's spark-submit/conf management): everything in [[local]]'s
    * correctness set, plus the scale knobs this library's plan shapes
    * assume —
    *  - `spark.sql.adaptive.enabled=true` + `spark.sql.adaptive
    *    .coalescePartitions.enabled=true`: runtime right-sizing of every
    *    shuffle (the library never hand-tunes per-query partition counts);
    *  - `spark.sql.adaptive.skewJoin.enabled=true`: runtime skew-split
    *    backstop behind the explicit `SkewJoin` toolbox;
    *  - `spark.sql.shuffle.partitions` ≈ 2-3x total executor cores as the
    *    pre-AQE ceiling;
    *  - `spark.sql.files.maxPartitionBytes` at its 128 MiB default: scan
    *    tasks sized to row-group granularity (the z-order/bucketed layouts
    *    assume file-stat pruning, not giant merged splits);
    *  - `spark.sql.autoBroadcastJoinThreshold` left at default; the
    *    library broadcasts dimensions EXPLICITLY (`broadcast(...)`) so
    *    plan shape never depends on a size estimate being right;
    *  - `spark.sql.extensions=graft.plans.GraftExtensions`: config-based
    *    registration of the native expressions (cosine, md5h60,
    *    nearest-centroid) — the supported multi-session path (see
    *    `PortableHash.md5Hash60`'s single-session note).
    */
  val clusterConf: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.extensions" -> "graft.plans.GraftExtensions",
    // keep lit(0) window partition keys — the library's bounded-domain
    // single-partition annotation (see local()) — from being folded away
    "spark.sql.optimizer.excludedRules" ->
      "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions")
}
