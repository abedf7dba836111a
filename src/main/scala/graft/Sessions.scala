package graft

import org.apache.spark.sql.SparkSession

/** Single place where graft sessions are configured, so no loader or
  * operator ever mutates session conf as a side effect.
  */
object Sessions {
  /** Local session sized by SPARK_GRAFT_CPUS (driver default 4; bench
    * runs local[32]). Shuffle partitions match the core count — the
    * 200 default is wrong for a single-JVM local run.
    */
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS), which the vectorized
      // parquet reader rejects; read nanos as long (Tables.events
      // converts to a microsecond timestamp). Set once here, never in
      // a loader (a read-time conf.set would be a hidden global
      // side effect, order-dependent across queries).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE re-plans at runtime: broadcast-downgrade of shuffle joins
      // when the built side turns out small, skew-join splitting.
      .config("spark.sql.adaptive.enabled", "true")
      // graft's native expressions (graft_cosine, ...)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // keep bucketed-table metadata out of the repo working dir
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()

  /** Whether self-verifying entries should compute their in-entry
    * EXACT baselines (default on: the correctness gate and the specs
    * rely on the evidence columns). The bench turns it off so sweep
    * timings measure the production path, not the instrumentation —
    * the two baseline-heavy entries (etl_profile_sketch,
    * dedup_method_eval) would otherwise spend 3-6× their production
    * cost re-deriving exact truth in-entry. */
  def svBaselines(s: SparkSession): Boolean =
    s.conf.getOption("spark.graft.svBaselines").forall(_.toBoolean)
}
