package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan

/** L6 — the plan-regression LEDGER: L4's fingerprint and L5's shuffle
  * bill for every production query, stored as committed data and
  * diffed on every test run. The oracle gate catches silent RESULT
  * changes; this catches silent PLAN changes — a Spark upgrade, a
  * stats drift, or a refactor that flips a broadcast to a shuffle (or
  * doubles an exchange, as in the r5 text_decontaminate episode where
  * an extra subtree execution shipped unnoticed) fails a test naming
  * the entry, and the fix is an adjudicated one-line ledger update in
  * the same diff as the code that caused it.
  *
  * Stability engineering, because a useful ledger must not flake:
  *  - fingerprints hash the CANONICALIZED optimized plan (Spark's own
  *    `sameResult` normalization: expression ids and alias names gone);
  *  - transient fixture paths (/tmp staging dirs keyed by pid/nanos)
  *    are regex-normalized out, so an entry that re-materializes its
  *    fixture per invocation still fingerprints stably;
  *  - each entry is constructed TWICE at ledger-build time; any entry
  *    whose two fingerprints or bills disagree is recorded UNSTABLE
  *    and exempted from equality (presence is still enforced) — the
  *    honest class for plans with genuinely per-run shapes;
  *  - the shuffle bill records exchange KINDS and normalized
  *    partitionings, not byte estimates: counts and keys are what
  *    regress structurally, size estimates drift with every testdata
  *    regeneration.
  */
object PlanLedger {

  val Unstable = "UNSTABLE"

  /** Strip the run-variant parts of a plan string: expression ids
    * (#123), plan ids, and transient /tmp fixture paths. */
  private[graft] def normalize(s: String): String = s
    .replaceAll("#\\d+", "#x")
    .replaceAll("plan_id=\\d+", "plan_id=x")
    .replaceAll("/tmp/[^\\s,\\)\\]]*", "<TMP>")

  /** Stable fingerprint of the canonicalized optimized plan: MD5 over
    * the SORTED multiset of per-node signatures, each node contributing
    * its name plus the sorted TOKEN multiset of its expressions'
    * normalized canonical strings.
    *
    * Why not hash the plan string directly (L4's exact form): operand
    * order inside Catalyst's canonicalized commutative operations
    * (And/Or/Multiply conjunct order, the multi-distinct Expand's
    * grouping list, inferred constraints) sorts by hashCodes that
    * track RAW expression ids — a global JVM counter — so the string
    * permutes with how many expressions existed before the query was
    * built (fixture cache state, suite order). Those permutations are
    * sameResult-equivalent noise; a committed ledger must not flake on
    * them. The per-node token multiset is order-insensitive yet still
    * moves whenever a node appears/disappears, a function or literal
    * changes, a column enters or leaves, or the tree restructures —
    * the regressions the ledger exists to catch. */
  /** The optimized plan WITHOUT cache substitution.
    * `df.queryExecution.optimizedPlan` runs through withCachedData,
    * which swaps any subtree matching a currently-cached frame for an
    * InMemoryRelation — so plan identity would depend on which OTHER
    * suites/queries happen to hold caches at the moment of
    * construction (parallel ScalaTest suites share one session).
    * Running the session's optimizer directly on the analyzed plan is
    * exactly QueryExecution's pipeline minus that lookup. */
  private def cacheFreeOptimized(df: DataFrame): LogicalPlan =
    df.sparkSession.sessionState.optimizer.execute(df.queryExecution.analyzed)

  /** Physical plan from the cache-free optimized plan —
    * QueryExecution.createSparkPlan + prepareExecutedPlan, invoked
    * reflectively (they are private[sql] but public in bytecode); the
    * physical pipeline has no cache lookup, so the resulting exchange
    * bill is cache-state-independent too. */
  private def cacheFreeExecutedPlan(df: DataFrame): SparkPlan = {
    val spark = df.sparkSession
    val opt = cacheFreeOptimized(df)
    // The reflective contract is pinned to the Spark 4.1 line; a
    // patch/minor bump that renames either hook must fail with THIS
    // message, not a bare NoSuchMethodException in every LedgerSpec run.
    def resolve[T](what: String)(body: => T): T =
      try body catch {
        case e @ (_: ClassNotFoundException | _: NoSuchMethodException) =>
          throw new IllegalStateException(
            s"PlanLedger's cache-free physical-plan accessor expects $what " +
              s"(contract verified against Spark 4.1.2, running " +
              s"${org.apache.spark.SPARK_VERSION}); the Spark upgrade " +
              "changed this private[sql] surface — update " +
              "PlanLedger.cacheFreeExecutedPlan.", e)
      }
    val qeClass = resolve("class o.a.s.sql.execution.QueryExecution")(
      Class.forName("org.apache.spark.sql.execution.QueryExecution"))
    val sessClass = resolve("class o.a.s.sql.classic.SparkSession")(
      Class.forName("org.apache.spark.sql.classic.SparkSession"))
    val create = resolve("QueryExecution.createSparkPlan(SparkPlanner, LogicalPlan)")(
      qeClass.getMethod("createSparkPlan",
        Class.forName("org.apache.spark.sql.execution.SparkPlanner"),
        classOf[LogicalPlan]))
    val prepare = resolve("QueryExecution.prepareExecutedPlan(SparkSession, SparkPlan)")(
      qeClass.getMethod("prepareExecutedPlan", sessClass, classOf[SparkPlan]))
    val sparkPlan =
      create.invoke(null, spark.sessionState.planner, opt)
    prepare.invoke(null, spark, sparkPlan).asInstanceOf[SparkPlan]
  }

  def fingerprint(df: DataFrame): String = {
    val lines = cacheFreeOptimized(df).canonicalized.collect {
      case n =>
        val toks = n.expressions
          .map(e => normalize(e.canonicalized.toString)).mkString(" ")
          .split("[^A-Za-z0-9_.#]+").filter(_.nonEmpty)
          .sorted.mkString(" ")
        n.nodeName + "[" + toks + "]"
    }.sorted
    java.security.MessageDigest.getInstance("MD5")
      .digest(lines.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Sort the comma-separated args inside a partitioning string —
    * hash-partitioning key order permutes with the same exprId-
    * dependent set iteration as above and is semantically a set. */
  private[graft] def sortArgs(p: String): String = {
    val i = p.indexOf('(')
    if (i < 0 || !p.endsWith(")")) p
    else {
      val args = p.substring(i + 1, p.length - 1)
      // split only at depth 0 so nested calls stay intact
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var depth = 0; val cur = new StringBuilder
      args.foreach {
        case c @ ('(' | '[') => depth += 1; cur.append(c)
        case c @ (')' | ']') => depth -= 1; cur.append(c)
        case ',' if depth == 0 => out += cur.result().trim; cur.clear()
        case c => cur.append(c)
      }
      if (cur.nonEmpty) out += cur.result().trim
      p.substring(0, i + 1) + out.sorted.mkString(", ") + ")"
    }
  }

  /** The entry's shuffle bill as one comparable line:
    * `<nShuffle>s/<nBroadcast>b <kind>:<partitioning>|...` with
    * partitionings normalized (ids, paths, arg order) and sorted. */
  def billSummary(df: DataFrame): String = {
    val bill = Lint.shuffleBill(cacheFreeExecutedPlan(df))
    val n = bill.count(_.kind == "shuffle")
    val b = bill.count(_.kind == "broadcast")
    val parts = bill.map(c => c.kind + ":" + sortArgs(normalize(c.partitioning)))
      .sorted.mkString("|")
    s"${n}s/${b}b $parts"
  }

  /** Build both ledger values for one entry, constructing it twice;
    * disagreement between the constructions means the entry's plan is
    * per-run-variant and is recorded UNSTABLE. */
  def entryValues(build: () => DataFrame): (String, String) = {
    val d1 = build(); val fp1 = fingerprint(d1); val b1 = billSummary(d1)
    val d2 = build(); val fp2 = fingerprint(d2); val b2 = billSummary(d2)
    (if (fp1 == fp2) fp1 else Unstable, if (b1 == b2) b1 else Unstable)
  }

  def read(path: String): Map[String, String] = {
    val f = new java.io.File(path)
    if (!f.exists()) Map.empty
    else scala.io.Source.fromFile(f, "UTF-8").getLines()
      .filter(_.nonEmpty).zipWithIndex.map { case (l, ln) =>
        val i = l.indexOf('\t')
        require(i >= 0, s"$path:${ln + 1}: ledger line has no tab " +
          s"separator (hand-edit or merge conflict?): '${l.take(120)}'")
        l.substring(0, i) -> l.substring(i + 1)
      }.toMap
  }

  def write(path: String, m: Map[String, String]): Unit = {
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val w = new java.io.PrintWriter(f)
    try m.toSeq.sortBy(_._1).foreach { case (k, v) => w.println(s"$k\t$v") }
    finally w.close()
  }
}
