package graft

import org.apache.spark.sql.SparkSession

/** Single place where graft sessions are configured, so no loader or
  * operator ever mutates session conf as a side effect.
  */
object Sessions {
  /** Local session sized by SPARK_GRAFT_CPUS (driver default 4; bench
    * runs local[32]). Shuffle partitions match the core count — the
    * 200 default is wrong for a single-JVM local run.
    *
    * SPARK_GRAFT_MASTER overrides the master URL; the supported
    * override is `local-cluster[W,C,M]` (standalone workers in the
    * driver JVM, each EXECUTOR a separate JVM with real Netty
    * shuffle/broadcast transport and task-retry semantics) — the
    * multi-executor regime a single local[n] JVM can never exercise.
    * Every main (Verify, Bench, ScaleBench) and the oracle gate gain
    * cluster mode through this one switch, so the multi-JVM sweep runs
    * the IDENTICAL code paths the driver grades. Executor JVMs on this
    * machine see graft classes via extraClassPath = our own classpath
    * (same host, same files); memory fits the worker grant W×M.
    */
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession =
    withMaster(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"), cpus)

  /** Session against an explicit master URL — [[ClusterCheck]] runs a
    * local[] baseline and a local-cluster[] sweep sequentially in ONE
    * JVM, which an env-var switch can't express. */
  def withMaster(master: String, cpus: String): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
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
      // Join planning policy (optimization guide §3.1): when false the
      // planner may pick shuffled-hash join over sort-merge when its
      // size conditions hold (smaller side under threshold × shuffle
      // partitions), skipping both sort passes. Parameterized for A/B;
      // the default is the measured choice for this suite. The env
      // value is VALIDATED here: a non-boolean would otherwise surface
      // later as an opaque conf parse error at session build.
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.get("SPARK_GRAFT_PREFER_SMJ") match {
          case Some(v) if v.equalsIgnoreCase("true")
            || v.equalsIgnoreCase("false") => v.toLowerCase
          case Some(v) =>
            System.err.println(
              s"[sessions] ignoring non-boolean SPARK_GRAFT_PREFER_SMJ=$v")
            "true"
          case None => "true"
        })
      // graft's native expressions (graft_cosine, ...)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // keep bucketed-table metadata out of the repo working dir
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
    val withCluster =
      if (!master.startsWith("local-cluster")) b
      else {
        // worker grant is the M in local-cluster[W,C,M] (MiB); size the
        // executor just under it so exactly one executor fits per worker
        val memMb = master.replaceAll("[^0-9,]", "").split(",")
          .lift(2).map(_.toInt).getOrElse(1024)
        // ABSOLUTIZE every classpath entry: executor JVMs run in the
        // Worker's scratch dir, so a relative entry (e.g. a plain
        // `java -cp target/...classes` launch) silently fails to
        // resolve there and graft classes arrive via a second
        // classloader — SerializedLambda/DefaultSerializationProxy
        // ClassCastExceptions on exactly the entries that ship native
        // expression trees (26 entries, r10 measured). sbt's fork uses
        // absolute paths, which is why the suite never saw it.
        b.config("spark.executor.extraClassPath",
          sys.props("java.class.path").split(java.io.File.pathSeparator)
            .filter(_.nonEmpty)
            .map(p => new java.io.File(p).getAbsolutePath)
            .mkString(java.io.File.pathSeparator))
          .config("spark.executor.memory", s"${math.max(512, memMb - 256)}m")
          // the worker's executor launcher always resolves the Scala
          // version; under sbt (no bin/load-spark-env.sh) the env var
          // is absent and AbstractCommandBuilder.getScalaVersion dies
          // with "Cannot find any build directories"
          .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
          // a killed executor must not fail the app before the fault
          // drill's retry assertion can see the recovery
          .config("spark.task.maxFailures", "4")
      }
    withCluster.getOrCreate()
  }
  // The r9-r13 `spark.graft.svBaselines` bench gate is gone (r14):
  // conf-gated entries timed a smaller computation in bench mode than
  // the one verify and the specs executed. The exact-baseline
  // instrumentation now lives in dedicated `*_eval` entries
  // (q_approx_percentile_eval, q_sketch_rollup_eval,
  // q_quantile_rollup_eval, etl_profile_sketch_eval), and the
  // recall/truth-evidence entries whose oracles COVER that evidence
  // (ann_lsh/ann_ivf/ann_ivf_imi/..., dedup_method_eval) compute it
  // unconditionally — bench and verify time identical query bodies.
}
