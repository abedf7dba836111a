package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JdbcSink integration behaviors, written once and run against a
  * MATRIX of embedded dialects (the reference targets PostgreSQL; the
  * portable two-statement upsert must not be Derby-shaped by
  * accident): real upsert round-trips, not mocks — insert,
  * update-on-key, transactional batching across partitions, schema
  * evolution. Concrete subclasses supply (url, driver); a dialect
  * whose driver is absent from the offline image self-cancels via
  * `assume`. */
abstract class JdbcSinkDialectSpec extends SparkSpec {

  /** Short tag baked into test names so matrix failures name the
    * engine. These are defs, not vals: they are read while the
    * SUPERCLASS constructor registers tests, before subclass fields
    * would initialize. */
  protected def dialect: String
  protected def url: String
  protected def driverClass: String

  private lazy val driverPresent: Boolean =
    try { Class.forName(driverClass); true }
    catch { case _: ClassNotFoundException => false }

  /** Per-test guard: skips (not fails) when the engine's driver jar is
    * not in this image. */
  protected def dialectTest(name: String)(body: => Unit): Unit =
    test(s"[$dialect] $name") { assume(driverPresent, s"$driverClass absent"); body }

  private def readTable(table: String) = {
    val raw = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driverClass)
      .load()
    // Engines whose JDBC metadata omits signedness (DuckDB) make Spark
    // read BIGINT back as DECIMAL(20,0); normalize scale-0 decimals to
    // LONG so the behavior assertions stay engine-independent.
    raw.select(raw.schema.fields.map { f =>
      f.dataType match {
        case d: org.apache.spark.sql.types.DecimalType if d.scale == 0 =>
          col(f.name).cast("long").as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)
  }

  dialectTest("E5-JDBC: upsert inserts new keys and updates existing ones") {
    import spark.implicits._
    val t = "upsert_spec"
    val batch1 = Seq(
      ("90001", "Cedar County", 10L),
      ("90002", "Pine County", 20L),
      ("90003", "Oak County", 30L)).toDF("zipcode", "county", "pop")
    JdbcSink.upsert(batch1, url, t, Seq("zipcode"), batchSize = 2)
    val after1 = readTable(t)
    assert(after1.count() === 3)

    // batch 2: one key update, one new key — MERGE semantics
    val batch2 = Seq(
      ("90002", "Pine County Updated", 25L),
      ("90004", "Lake County", 40L)).toDF("zipcode", "county", "pop")
    JdbcSink.upsert(batch2, url, t, Seq("zipcode"))
    val after2 = readTable(t).orderBy("zipcode").collect()
    assert(after2.length === 4)
    assert(after2.map(_.getString(0)).toSeq ===
      Seq("90001", "90002", "90003", "90004"))
    val updated = after2.find(_.getString(0) == "90002").get
    assert(updated.getString(1) === "Pine County Updated")
    assert(updated.getLong(2) === 25L)
  }

  dialectTest("E5-JDBC: parallel partitions upsert disjoint keys transactionally") {
    import spark.implicits._
    val t = "upsert_par"
    val big = (0 until 500).map(i => (f"z$i%05d", s"county $i", i.toLong))
      .toDF("zipcode", "county", "pop")
      .repartition(8, col("zipcode"))
    JdbcSink.upsert(big, url, t, Seq("zipcode"), batchSize = 50)
    assert(readTable(t).count() === 500)
    // second pass updates every row in parallel
    val bumped = big.withColumn("pop", col("pop") + 1000L)
    JdbcSink.upsert(bumped, url, t, Seq("zipcode"), batchSize = 50)
    val back = readTable(t)
    assert(back.count() === 500)
    assert(back.filter(col("pop") < 1000L).count() === 0, "every row updated")
  }

  dialectTest("E5-JDBC: ensureTable is idempotent regardless of identifier case form") {
    import spark.implicits._
    val df = Seq(("k1", 1L)).toDF("id", "pop")
    // second ensureTable must find the (upper-cased by Derby,
    // case-preserved by others) table via the case-form probe and not
    // re-issue CREATE; lower/mixed-case names exercise both shapes
    for (t <- Seq("case_probe_lower", "Case_Probe_Mixed")) {
      JdbcSink.ensureTable(url, t, df.schema, Seq("id"))
      JdbcSink.ensureTable(url, t, df.schema, Seq("id"))
      JdbcSink.upsert(df, url, t, Seq("id"))
      assert(readTable(t).count() === 1)
    }
  }

  dialectTest("IO10-JDBC: upsert with a new column ALTERs the target; old rows read NULL") {
    import spark.implicits._
    val t = "evolve_add"
    val v1 = Seq(("90001", "Cedar"), ("90002", "Pine")).toDF("zipcode", "county")
    JdbcSink.upsert(v1, url, t, Seq("zipcode"))
    // v2 grows a population column — the EF AddColumn migration shape
    val v2 = Seq(("90002", "Pine Updated", 25L), ("90003", "Oak", 30L))
      .toDF("zipcode", "county", "pop")
    JdbcSink.upsert(v2, url, t, Seq("zipcode"))
    val back = readTable(t).orderBy("zipcode").collect()
    assert(back.length === 3)
    assert(back.map(_.getString(0)).toSeq === Seq("90001", "90002", "90003"))
    // pre-evolution row: never written with pop → NULL
    assert(back(0).isNullAt(2), "pre-evolution row must read NULL in the new column")
    assert(back(1).getString(1) === "Pine Updated" && back(1).getLong(2) === 25L)
    assert(back(2).getLong(2) === 30L)
    // and the SHRUNK schema still upserts (absent columns left alone)
    JdbcSink.upsert(Seq(("90001", "Cedar v3")).toDF("zipcode", "county"),
      url, t, Seq("zipcode"))
    val again = readTable(t).orderBy("zipcode").collect()
    assert(again(0).getString(1) === "Cedar v3" && again(0).isNullAt(2))
    assert(again(1).getLong(2) === 25L, "columns absent from the frame are untouched")
  }

  dialectTest("IO10-JDBC: an incompatible column type change is rejected, not improvised") {
    import spark.implicits._
    val t = "evolve_reject"
    JdbcSink.upsert(Seq(("k1", 10L)).toDF("id", "pop"), url, t, Seq("id"))
    val e = intercept[IllegalArgumentException] {
      // pop was BIGINT; a string pop is a migration, not a write
      JdbcSink.upsert(Seq(("k1", "ten")).toDF("id", "pop"), url, t, Seq("id"))
    }
    assert(e.getMessage.contains("incompatible schema change"))
    // the reject must leave the table intact and writable
    JdbcSink.upsert(Seq(("k2", 20L)).toDF("id", "pop"), url, t, Seq("id"))
    assert(readTable(t).count() === 2)
    // type-family synonyms are NOT rejected: INTEGER frame into BIGINT
    // column (engines report synonym codes; exact-code matching would
    // false-positive)
    JdbcSink.upsert(Seq(("k3", 30)).toDF("id", "pop"), url, t, Seq("id"))
    assert(readTable(t).count() === 3)
  }

  dialectTest("E15-JDBC: per-batch-transaction retry mode produces identical results") {
    import spark.implicits._
    val t = "upsert_retry_happy"
    val rows = (0 until 120).map(i => (f"r$i%03d", i.toLong))
      .toDF("id", "pop").repartition(4, col("id"))
    JdbcSink.upsert(rows, url, t, Seq("id"), batchSize = 25, maxTxnRetries = 2)
    assert(readTable(t).count() === 120)
    // idempotent replay of the same frame (what a task retry does)
    JdbcSink.upsert(rows, url, t, Seq("id"), batchSize = 25, maxTxnRetries = 2)
    assert(readTable(t).count() === 120)
  }

  dialectTest("E15-JDBC: contended upsert lands all rows despite a concurrent writer") {
    import spark.implicits._
    val t = "upsert_contended"
    JdbcSink.upsert(Seq(("k1", 0L), ("k2", 0L)).toDF("id", "pop"),
      url, t, Seq("id"))
    // a competing transaction updates k1 and holds it open briefly —
    // engines either block (Derby row locks) or throw a transient
    // conflict (optimistic engines); the retrying sink must land the
    // write either way once the holder commits
    val holder = java.sql.DriverManager.getConnection(url)
    holder.setAutoCommit(false)
    val st = holder.createStatement()
    st.executeUpdate(s"UPDATE $t SET pop = 99 WHERE id = 'k1'")
    val releaser = new Thread(() => {
      Thread.sleep(400); holder.commit(); st.close(); holder.close()
    })
    releaser.start()
    try {
      JdbcSink.upsert(Seq(("k1", 7L), ("k3", 3L)).toDF("id", "pop")
        .coalesce(1), url, t, Seq("id"),
        maxTxnRetries = 6, retryBackoffMs = 100L)
    } finally releaser.join()
    val back = readTable(t).orderBy("id").collect()
    assert(back.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("k1", 7L), ("k2", 0L), ("k3", 3L)))
  }

  dialectTest("E5-JDBC: nulls round-trip and unsupported types fail with a clear error") {
    import spark.implicits._
    val t = "upsert_nulls"
    val withNull = Seq(("k1", Some(1.5)), ("k2", None))
      .toDF("id", "score")
    JdbcSink.upsert(withNull, url, t, Seq("id"))
    val back = readTable(t).orderBy("id").collect()
    assert(back.length === 2)
    assert(back(1).isNullAt(1), "NULL survives the MERGE round-trip")
    val arr = Seq(("k1", Seq(1.0, 2.0))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      JdbcSink.upsert(arr, url, "upsert_bad", Seq("id"))
    }
    assert(e.getMessage.contains("no JDBC mapping"))
  }
}

/** Dialect 1: embedded Derby (ships with /opt/spark/jars). Upper-cases
  * unquoted identifiers, reports real per-row batch counts. */
class JdbcSinkSpec extends JdbcSinkDialectSpec {
  protected def dialect = "derby"
  protected def url = "jdbc:derby:memory:graftdb;create=true"
  protected def driverClass = "org.apache.derby.jdbc.EmbeddedDriver"

  // engine-independent decision-function unit test lives once, here
  test("E5-JDBC: SUCCESS_NO_INFO update counts fall back to the existence probe") {
    // Derby reports real counts, so the portability path is gated at
    // the decision function: drivers returning -2 per row (Oracle,
    // MySQL rewriteBatchedStatements) must probe, never assume updated
    val probed = scala.collection.mutable.ArrayBuffer[Int]()
    val missing = Set(2, 4)
    val res = JdbcSink.needsInsert(Array(1, 0, -2, -2, -2),
      i => { probed += i; missing.contains(i) })
    assert(res === Seq(1, 2, 4), "0 inserts directly; -2 inserts only on probe miss")
    assert(probed.toSeq === Seq(2, 3, 4), "exactly the unknown-count rows are probed")
    assert(JdbcSink.needsInsert(Array(1, 1), _ => fail("no probe for real counts")) === Seq())
  }

  test("E15-JDBC: withTxnRetries replays transient failures with backoff, rethrows the rest") {
    def transient(msg: String) =
      new java.sql.SQLTransactionRollbackException(msg, "40001")
    // two transient failures then success: body runs 3 times
    var calls = 0
    val out = JdbcSink.withTxnRetries(3, 1L) { () =>
      calls += 1
      if (calls < 3) throw transient(s"deadlock $calls") else "done"
    }
    assert(out === "done" && calls === 3)
    // exhaustion: maxRetries=2 → 3 attempts, then the failure escapes
    var calls2 = 0
    val e = intercept[java.sql.SQLException] {
      JdbcSink.withTxnRetries(2, 1L) { () =>
        calls2 += 1; throw transient("always")
      }
    }
    assert(calls2 === 3 && e.getMessage === "always")
    // non-transient: no replay at all
    var calls3 = 0
    intercept[java.sql.SQLException] {
      JdbcSink.withTxnRetries(5, 1L) { () =>
        calls3 += 1
        throw new java.sql.SQLSyntaxErrorException("bad sql", "42000")
      }
    }
    assert(calls3 === 1)
  }

  test("E15-JDBC: the transient classifier covers class-40 states, JDBC types, and conflict messages") {
    import JdbcSink.isTransient
    assert(isTransient(new java.sql.SQLTransactionRollbackException("d", "40001")))
    assert(isTransient(new java.sql.SQLException("serialization", "40P01")))
    assert(isTransient(new java.sql.SQLTransientConnectionException("t")))
    assert(isTransient(new java.sql.SQLRecoverableException("r")))
    assert(isTransient(new java.sql.SQLException(
      "TransactionContext Error: write-write Conflict on update")))
    assert(!isTransient(new java.sql.SQLSyntaxErrorException("bad", "42000")))
    assert(!isTransient(new java.sql.SQLIntegrityConstraintViolationException("pk", "23505")))
  }
}

/** Dialect 2: embedded DuckDB (driver jar from the image's pre-warmed
  * artifact cache — the same engine the DuckDB oracle runs on, so a
  * sink bug that is invisible under Derby's identifier/type conventions
  * surfaces against a second, case-preserving, columnar engine). The
  * database is file-backed because the in-memory form is
  * per-connection private and `upsert` opens one connection per
  * partition — they must all see one database, exactly as executors
  * sharing a warehouse would. */
class DuckDbJdbcSinkSpec extends JdbcSinkDialectSpec {
  protected def dialect = "duckdb"
  private lazy val dbPath =
    s"/tmp/graft_duckdb_sink_${ProcessHandle.current().pid()}.db"
  protected def url = s"jdbc:duckdb:$dbPath"
  protected def driverClass = "org.duckdb.DuckDBDriver"

  override def afterAll(): Unit = {
    try super.afterAll()
    finally Seq("", ".wal").foreach(sfx =>
      new java.io.File(dbPath + sfx).delete())
  }
}
