package graft

import org.apache.spark.sql.DataFrame

/** Canonical, layout-independent rendering of a query result: columns
  * sorted by name, every row rendered to one string, rows sorted. Two
  * executions of the same entry are equivalent iff their renderings
  * are equal — the comparison primitive behind the engine-wide
  * partition-invariance sweep (ConfRobustnessSpec) and the multi-JVM
  * parity sweep ([[ClusterCheck]]). Lives in main (not test) scope so
  * a runMain sweep and the specs share one definition.
  */
object RowsRender {

  def rows(df: DataFrame): Seq[String] = {
    val names = df.columns.sorted
    df.collect().map { r =>
      names.map { c =>
        val v = r.get(r.fieldIndex(c))
        c + "=" + render(v)
      }.mkString("|")
    }.sorted.toSeq
  }

  private def render(v: Any): String = v match {
    case a: Array[_] => a.map(render).mkString("[", ",", "]")
    case w: scala.collection.Seq[_] => w.map(render).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      // hash-order-dependent rendering would read as phantom layout
      // sensitivity — compare by sorted keys
      m.toSeq.map { case (k, mv) => s"${render(k)}->${render(mv)}" }
        .sorted.mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row =>
      r.toSeq.map(render).mkString("(", ",", ")")
    case other => String.valueOf(other)
  }

  /** Entries whose output embeds merge-order-dependent sketch VALUES
    * (randomized KLL/theta compaction, approx_top_k merge order,
    * HLL++ sparse→dense threshold switches): execution-layout sweeps
    * (partition-count robustness, multi-JVM parity) compare their row
    * COUNTS and schemas but not the estimates themselves — each is the
    * documented randomized-compaction class in SURVEY §2. */
  val sketchValueExempt: Set[String] = Set(
    "q_approx_percentile",      // QuantileSummaries merge-order drift
    "q_approx_percentile_eval", // same sketch beside its exact baseline
    "q_quantile_rollup",        // KLL compaction randomized on merge
    "q_quantile_rollup_eval",   // same sketch beside its exact baseline
    "q_theta_algebra",          // theta-sketch sampling under union
    "q_sketch_overlap",         // theta intersection estimates
    "q_topk_sketch_rollup",     // approx_top_k sketch merge order
    "text_heavy_hitters",       // approx_top_k sketch merge order
    "etl_profile_sketch",       // per-column HLL/top-k profile
    "etl_profile_sketch_eval",  // same profile beside its exact baseline
    "q_watermark_plan",         // QuantileSummaries over arrival lag
    "q_approx_distinct",        // HLL++ sparse/dense merge threshold
    "q_sketch_rollup",          // HLL++ sparse/dense merge threshold
    "q_sketch_rollup_eval",     // same sketch beside its exact baseline
    "q_rolling_distinct_sketch" // HLL++ sparse/dense merge threshold
  )

  /** MD5 of the rendering — O(1) to hold per entry across a sweep.
    * A NUL byte separates rows: without it the digest sees one
    * concatenated stream, so two different row multisets whose
    * renderings share a boundary-shifted concatenation (possible when
    * string columns contain the field separators) would collide. NUL
    * cannot appear in a rendered row (UTF-8 of real column text). */
  def digest(df: DataFrame): (Int, String) = {
    val rs = rows(df)
    val md = java.security.MessageDigest.getInstance("MD5")
    rs.foreach { r => md.update(r.getBytes("UTF-8")); md.update(0.toByte) }
    (rs.size, md.digest().map("%02x".format(_)).mkString)
  }
}
