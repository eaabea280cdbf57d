package graft

import org.apache.spark.sql.SparkSession

/** The ONE tuned-session definition for every entry point — Bench,
  * Verify, the profiling tools, and the test harness all build their
  * session here, so a session-level optimization (the r16 cached-plan
  * AQE flag was copy-pasted into two mains and silently absent
  * everywhere else) lands in every JVM that runs graft plans.
  *
  * Tuned settings, each measured:
  *  - `canChangeCachedPlanOutputPartitioning` (SPARK-38389; default
  *    false): operators persist small intermediate frames (index keys,
  *    candidate pairs, signed batches) whose pre-AQE partitioning is
  *    the full shuffle-partition count; without this flag every such
  *    frame materializes at that width and every downstream job
  *    inherits it. With it, AQE coalesces cached plans to the advisory
  *    size — scale-neutral (big frames keep big-frame parallelism).
  *    Measured −15% on a 41-query battery slice at sf0.1 (235.1 →
  *    199.9 s, OPTIMIZATION_r16.md §config), re-confirmed per-query in
  *    r17 (every query in the r16 anti-scaling cluster is faster or
  *    equal with the flag ON — OPTIMIZATION_r17.md §AQE-A/B).
  *    Env-overridable (`SPARK_GRAFT_CACHED_PLAN_AQE`, true/false) for
  *    A/B measurement.
  *
  * Deliberately NOT set here (measured rejections, kept out so a
  * future tuner does not re-try them blind):
  *  - `spark.sql.adaptive.coalescePartitions.parallelismFirst=false`:
  *    −10% sounded plausible (fewer tiny tasks) but measured +10%
  *    battery-wide at sf0.1 — the per-row-heavy text stages are
  *    byte-light, so size-targeted coalescing serializes them
  *    (OPTIMIZATION_r17.md §negative-results).
  */
object GraftSession {

  /** Builder with the tuned session shape; callers pick master and
    * shuffle width (the driver contract reads both from env).
    */
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHED_PLAN_AQE", "true"))

  /** The driver-contract local session: `local[$SPARK_GRAFT_CPUS]`
    * with shuffle width = core count (AQE coalesces down from there).
    */
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    builder(s"local[$cpus]", cpus).getOrCreate()
  }
}
