package graft.etl

import java.sql.{Connection, DriverManager, PreparedStatement, Types}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** E5 production variant: transactional upsert into a JDBC table — the
  * reference's `BulkInsertOrUpdateAsync` into PostgreSQL
  * (`DataflowProcessor.cs:222-247`). Spark's own `df.write.jdbc` is
  * INSERT-only, so upsert runs per-partition as TWO BATCHED statements
  * per `batchSize` rows: a batched UPDATE, then a batched INSERT for
  * the rows whose update count was 0. That shape is portable across
  * every JDBC dialect (MERGE/ON CONFLICT source-clause rules differ
  * per engine — Derby only MERGEs from base tables, PostgreSQL grew
  * MERGE in 15), still ~2 round-trips per batch, and mirrors the
  * reference's ActionBlock batching re-expressed on the cluster.
  *
  * Caller contract: one row per key (run dedupe first — E2). Duplicate
  * keys split across partitions would race their update/insert pairs;
  * with unique keys partitions touch disjoint rows and cannot
  * deadlock.
  *
  * Scale shape: the DataFrame side streams partition-at-a-time holding
  * at most `batchSize` rows (no driver collect, no whole-partition
  * buffering); total parallelism is one connection per partition, so
  * coalesce to what the database tolerates — the knob the reference
  * hardcodes as its ActionBlock MaxDegreeOfParallelism.
  */
object JdbcSink extends Serializable {

  /** ANSI DDL type for a Spark field (VARCHAR sized — Derby needs
    * concrete lengths). */
  private def sqlType(dt: DataType): String = dt match {
    case StringType => "VARCHAR(4096)"
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other =>
      throw new IllegalArgumentException(
        s"JdbcSink: no JDBC mapping for ${other.sql} — serialize it first " +
          "(e.g. to_json for arrays/structs)")
  }

  /** java.sql.Types code for typed NULL binds. */
  private def typeCode(dt: DataType): Int = dt match {
    case StringType => Types.VARCHAR
    case LongType => Types.BIGINT
    case IntegerType => Types.INTEGER
    case ShortType => Types.SMALLINT
    case DoubleType => Types.DOUBLE
    case FloatType => Types.REAL
    case BooleanType => Types.BOOLEAN
    case DateType => Types.DATE
    case TimestampType => Types.TIMESTAMP
    case _: DecimalType => Types.DECIMAL
    case _ => Types.OTHER
  }

  /** Create the target table with a primary key on `keyCols` if it does
    * not exist yet; if it DOES exist, evolve it: columns the DataFrame
    * carries that the table lacks are added via ALTER TABLE ADD COLUMN
    * (nullable — existing rows read back NULL, the EF-migrations
    * AddColumn analogue), and a column whose JDBC type family no longer
    * matches the DataFrame's is REJECTED loudly (an incompatible type
    * change is a migration, not something a sink should improvise).
    * Table columns absent from the DataFrame are left alone — the
    * UPDATE/INSERT statements name their columns explicitly.
    *
    * Unquoted identifiers are stored upper-cased by some engines
    * (Derby, Oracle) and lower-cased by others (PostgreSQL), so the
    * existence probe tries every case form; if the probe still misses
    * (or loses a creation race) the CREATE's already-exists error is
    * swallowed after re-checking. */
  def ensureTable(url: String, table: String, schema: StructType,
      keyCols: Seq[String]): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      def caseForms(s: String) = Seq(s, s.toUpperCase, s.toLowerCase).distinct
      def exists: Boolean =
        try {
          caseForms(table).exists { t =>
            val rs = conn.getMetaData.getTables(null, null, t, null)
            try rs.next() finally rs.close()
          }
        } catch { case _: Exception => false }
      if (!exists) {
        val cols = schema.fields.map { f =>
          val nn = if (keyCols.contains(f.name)) " NOT NULL" else ""
          s"${f.name} ${sqlType(f.dataType)}$nn"
        }.mkString(", ")
        val pk = if (keyCols.isEmpty) ""
          else s", PRIMARY KEY (${keyCols.mkString(", ")})"
        val st = conn.createStatement()
        try st.executeUpdate(s"CREATE TABLE $table ($cols$pk)")
        catch {
          // already-exists SQLStates differ per engine (Derby X0Y32,
          // PostgreSQL 42P07, ...): re-probe instead of enumerating them
          case e: java.sql.SQLException => if (!exists) throw e
        }
        finally st.close()
      }
      if (exists) {
        // (column name upper-cased → java.sql.Types code) of the live table
        val live = scala.collection.mutable.LinkedHashMap[String, Int]()
        caseForms(table).foreach { t =>
          if (live.isEmpty) {
            val rs = conn.getMetaData.getColumns(null, null, t, null)
            try while (rs.next())
              live(rs.getString("COLUMN_NAME").toUpperCase) = rs.getInt("DATA_TYPE")
            finally rs.close()
          }
        }
        schema.fields.foreach { f =>
          live.get(f.name.toUpperCase) match {
            case None =>
              val st = conn.createStatement()
              try st.executeUpdate(
                s"ALTER TABLE $table ADD COLUMN ${f.name} ${sqlType(f.dataType)}")
              finally st.close()
            case Some(liveCode) if !compatibleTypes(liveCode, f.dataType) =>
              throw new IllegalArgumentException(
                s"JdbcSink: incompatible schema change for $table.${f.name}: " +
                  s"table has java.sql.Types code $liveCode, DataFrame wants " +
                  s"${f.dataType.sql} (code ${typeCode(f.dataType)}). Type " +
                  "changes need an explicit migration, not a sink write.")
            case _ => ()
          }
        }
      }
    } finally conn.close()
  }

  /** Is the table's live JDBC type an acceptable target for a Spark
    * field of type `dt`? Families, not exact codes — engines report
    * synonyms (VARCHAR/CHAR/CLOB for strings, NUMERIC/DECIMAL). */
  private[etl] def compatibleTypes(liveCode: Int, dt: DataType): Boolean = {
    val strings = Set(Types.VARCHAR, Types.CHAR, Types.LONGVARCHAR, Types.CLOB)
    val ints = Set(Types.BIGINT, Types.INTEGER, Types.SMALLINT, Types.TINYINT)
    val floats = Set(Types.DOUBLE, Types.FLOAT, Types.REAL)
    val decimals = Set(Types.NUMERIC, Types.DECIMAL)
    dt match {
      case StringType => strings(liveCode)
      case LongType | IntegerType | ShortType => ints(liveCode)
      case DoubleType | FloatType => floats(liveCode)
      case _: DecimalType => decimals(liveCode)
      case BooleanType => liveCode == Types.BOOLEAN || liveCode == Types.BIT
      case DateType => liveCode == Types.DATE
      case TimestampType => liveCode == Types.TIMESTAMP
      case _ => false
    }
  }

  /** Bind row fields at `fieldIdxs` (schema positions) to consecutive
    * statement parameters, typed NULLs included. */
  private def bind(ps: PreparedStatement, row: Row, fieldIdxs: Seq[Int],
      codes: Array[Int]): Unit = {
    var p = 1
    fieldIdxs.foreach { i =>
      if (row.isNullAt(i)) ps.setNull(p, codes(i))
      else ps.setObject(p, row.get(i))
      p += 1
    }
  }

  /** Which batch positions need an INSERT, from the batched UPDATE's
    * per-row counts. count >= 1: updated in place. count == 0:
    * definitely absent. count < 0 (Statement.SUCCESS_NO_INFO from e.g.
    * Oracle or MySQL with rewriteBatchedStatements): the driver
    * reported nothing per-row, so the decision falls back to an
    * existence probe — never assume "updated". */
  private[etl] def needsInsert(counts: Array[Int],
      probeMiss: Int => Boolean): Seq[Int] =
    counts.toSeq.zipWithIndex.collect {
      case (0, i) => i
      case (c, i) if c < 0 && probeMiss(i) => i
    }

  /** Transient-failure classifier for [[withTxnRetries]]: standard
    * SQLSTATE class 40 (serialization failure / deadlock — 40001,
    * PostgreSQL's 40P01), the JDBC transient/recoverable exception
    * types, and optimistic-concurrency conflict messages from engines
    * that surface them as plain SQLExceptions (DuckDB's
    * "TransactionContext Error: ... conflict"). Anything else —
    * constraint violations, syntax, auth — is NOT retryable: replaying
    * it would just fail again or, worse, paper over a logic bug. */
  private[etl] def isTransient(e: java.sql.SQLException): Boolean =
    e.isInstanceOf[java.sql.SQLTransientException] ||
      e.isInstanceOf[java.sql.SQLRecoverableException] ||
      Option(e.getSQLState).exists(_.startsWith("40")) ||
      Option(e.getMessage).exists(_.toLowerCase.contains("conflict"))

  /** Run `body` (one self-contained transaction attempt: open, write,
    * commit, close) with up to `maxRetries` replays on transient
    * failures, exponential backoff between attempts — the reference's
    * bounded retry policy (its Dataflow blocks retry failed API calls
    * the same way). Non-transient errors and retry exhaustion
    * propagate. */
  private[etl] def withTxnRetries[T](maxRetries: Int, backoffMs: Long)(
      body: () => T): T = {
    var attempt = 0
    var out = Option.empty[T]
    while (out.isEmpty) {
      try out = Some(body())
      catch {
        case e: java.sql.SQLException if isTransient(e) && attempt < maxRetries =>
          Thread.sleep(backoffMs << attempt)
          attempt += 1
      }
    }
    out.get
  }

  /** Apply a reduced CDC batch — one row per key, latest change wins,
    * tombstones still present (the [[Cdc.latestChanges]] shape) — to a
    * transactional table: tombstoned keys are DELETEd in batched
    * per-partition transactions, everything else goes through the
    * normal [[upsert]]. The two passes touch DISJOINT keys (one
    * surviving row per key), so their relative order is immaterial and
    * partitions cannot deadlock each other; both are idempotent, so a
    * replayed micro-batch (E8c exactly-once contract) converges to the
    * same table state. */
  def applyCdc(df: DataFrame, url: String, table: String, keyCols: Seq[String],
      opCol: String = "op", batchSize: Int = 1000, maxTxnRetries: Int = 0,
      retryBackoffMs: Long = 100L): Unit = {
    import org.apache.spark.sql.functions.col
    val payload = df.drop(opCol)
    ensureTable(url, table, payload.schema, keyCols)
    val codes = payload.schema.fields.map(f => typeCode(f.dataType))
    val keyIdx = keyCols.map(payload.schema.fieldNames.toSeq.indexOf)
    val deleteSql = s"DELETE FROM $table " +
      s"WHERE ${keyCols.map(k => s"$k = ?").mkString(" AND ")}"
    df.filter(col(opCol) === "D").drop(opCol)
      .foreachPartition { rows: Iterator[Row] =>
        if (rows.nonEmpty) {
          def attempt(batch: Seq[Row]): Unit = {
            val conn = DriverManager.getConnection(url)
            conn.setAutoCommit(false)
            try {
              val del = conn.prepareStatement(deleteSql)
              try {
                batch.foreach { r => bind(del, r, keyIdx, codes); del.addBatch() }
                del.executeBatch()
              } finally del.close()
              conn.commit()
            } catch { case e: Throwable => conn.rollback(); throw e }
            finally conn.close()
          }
          rows.grouped(batchSize).foreach { g =>
            val batch = g.toSeq
            withTxnRetries(maxTxnRetries, retryBackoffMs)(() => attempt(batch))
          }
        }
      }
    upsert(df.filter(col(opCol) =!= "D").drop(opCol), url, table, keyCols,
      batchSize, maxTxnRetries, retryBackoffMs)
  }

  /** Upsert `df` into `table` keyed by `keyCols`. Creates the table on
    * first use.
    *
    * Transaction granularity: with `maxTxnRetries = 0` (default) each
    * PARTITION is one transaction — all-or-nothing per task, no
    * replay. With `maxTxnRetries > 0` each BATCH is one transaction
    * and a transiently-failed batch (deadlock victim, optimistic-
    * concurrency conflict) is replayed on a fresh connection with
    * exponential backoff — the high-contention deployment mode.
    * Replays are safe because a rolled-back batch left no state and
    * the upsert itself is key-idempotent; the replay buffer is the
    * current batch only (≤ batchSize rows), so memory stays bounded
    * exactly as before. */
  def upsert(df: DataFrame, url: String, table: String, keyCols: Seq[String],
      batchSize: Int = 1000, maxTxnRetries: Int = 0,
      retryBackoffMs: Long = 100L): Unit = {
    val schema = df.schema
    require(keyCols.nonEmpty && keyCols.forall(schema.fieldNames.contains),
      s"keyCols $keyCols must be columns of ${schema.fieldNames.toSeq}")
    schema.fields.foreach(f => sqlType(f.dataType)) // fail fast on types
    ensureTable(url, table, schema, keyCols)

    val cols = schema.fieldNames.toSeq
    val nonKey = cols.filterNot(keyCols.contains)
    val keyIdx = keyCols.map(cols.indexOf)
    val nonKeyIdx = nonKey.map(cols.indexOf)
    val allIdx = cols.indices.toSeq
    val codes = schema.fields.map(f => typeCode(f.dataType))
    val updateSql =
      if (nonKey.isEmpty) ""
      else s"UPDATE $table SET ${nonKey.map(c => s"$c = ?").mkString(", ")} " +
        s"WHERE ${keyCols.map(k => s"$k = ?").mkString(" AND ")}"
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    // key-only tables have nothing to update: probe existence instead
    val probeSql = s"SELECT 1 FROM $table " +
      s"WHERE ${keyCols.map(k => s"$k = ?").mkString(" AND ")}"

    /** One open transaction: prepared statements + the two-statement
      * batch flush. Caller owns commit/rollback/close. */
    def withWriter[T](conn: Connection)(use: (Seq[Row] => Unit) => T): T = {
      val upd = if (nonKey.isEmpty) None else Some(conn.prepareStatement(updateSql))
      val ins = conn.prepareStatement(insertSql)
      val probe = conn.prepareStatement(probeSql)
      try {
        def probeMiss(r: Row): Boolean = {
          bind(probe, r, keyIdx, codes)
          val rs = probe.executeQuery()
          try !rs.next() finally rs.close()
        }
        def flush(batch: Seq[Row]): Unit = if (batch.nonEmpty) {
          val missed: Seq[Row] = upd match {
            case Some(u) =>
              batch.foreach { r => bind(u, r, nonKeyIdx ++ keyIdx, codes); u.addBatch() }
              val counts = u.executeBatch()
              needsInsert(counts, i => probeMiss(batch(i))).map(batch)
            case None =>
              batch.filter(probeMiss)
          }
          if (missed.nonEmpty) {
            missed.foreach { r => bind(ins, r, allIdx, codes); ins.addBatch() }
            ins.executeBatch()
          }
        }
        use(flush)
      } finally {
        upd.foreach(_.close()); ins.close(); probe.close()
      }
    }

    /** Open → write → commit → close, rolling back on any failure. */
    def inTransaction(write: (Seq[Row] => Unit) => Unit): Unit = {
      val conn: Connection = DriverManager.getConnection(url)
      conn.setAutoCommit(false)
      try withWriter(conn) { flush => write(flush); conn.commit() }
      catch { case e: Throwable => conn.rollback(); throw e }
      finally conn.close()
    }

    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        if (maxTxnRetries == 0)
          // partition = one transaction, no replay
          inTransaction { flush =>
            rows.grouped(batchSize).foreach(g => flush(g.toSeq))
          }
        else
          // batch = one transaction; transient failures replay THIS
          // batch on a fresh connection (the iterator is consumed one
          // bounded batch at a time, so replay needs no re-read)
          rows.grouped(batchSize).foreach { g =>
            val batch = g.toSeq
            withTxnRetries(maxTxnRetries, retryBackoffMs) { () =>
              inTransaction(flush => flush(batch))
            }
          }
      }
    }
  }

  /** S29 — exactly-once APPEND for `foreachBatch` into JDBC: the data
    * rows and a (batch_id, part_id) LEDGER row commit in ONE
    * transaction per partition, so a replayed micro-batch (restart,
    * task retry) finds its ledger row and skips — exactly-once
    * EFFECTIVE for plain appends, where [[upsert]] needs key
    * idempotence and E8c's recipe needs a merge key. A crash between
    * the data insert and the commit leaves NOTHING (single
    * transaction); a crash after commit is a recorded partition the
    * replay provably skips. The ledger probe is an in-transaction
    * SELECT (portable across engines — no reliance on
    * constraint-violation exception taxonomy); Spark serializes a
    * batch's re-execution, so probe-then-insert is race-free in the
    * foreachBatch contract. */
  def appendExactlyOnce(df: DataFrame, url: String, table: String,
      ledgerTable: String, batchId: Long, batchSize: Int = 1000): Unit = {
    val schema = df.schema
    schema.fields.foreach(f => sqlType(f.dataType))
    ensureTable(url, table, schema, keyCols = Seq.empty)
    ensureTable(url, ledgerTable, StructType(Seq(
      StructField("batch_id", LongType, nullable = false),
      StructField("part_id", IntegerType, nullable = false),
      StructField("n_rows", LongType))), Seq("batch_id", "part_id"))

    val cols = schema.fieldNames.toSeq
    val allIdx = cols.indices.toSeq
    val codes = schema.fields.map(f => typeCode(f.dataType))
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"

    df.foreachPartition { rows: Iterator[Row] =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val conn: Connection = DriverManager.getConnection(url)
      conn.setAutoCommit(false)
      try {
        val probe = conn.prepareStatement(
          s"SELECT 1 FROM $ledgerTable WHERE batch_id = ? AND part_id = ?")
        probe.setLong(1, batchId); probe.setInt(2, pid)
        val rs = probe.executeQuery()
        val committed = try rs.next() finally { rs.close(); probe.close() }
        if (!committed) {
          val ins = conn.prepareStatement(insertSql)
          var n = 0L
          try rows.grouped(batchSize).foreach { g =>
            g.foreach { r => bind(ins, r, allIdx, codes); ins.addBatch(); n += 1 }
            ins.executeBatch()
          } finally ins.close()
          val led = conn.prepareStatement(
            s"INSERT INTO $ledgerTable (batch_id, part_id, n_rows) " +
              "VALUES (?, ?, ?)")
          try {
            led.setLong(1, batchId); led.setInt(2, pid); led.setLong(3, n)
            led.executeUpdate()
          } finally led.close()
          conn.commit()
        } else {
          // committed replica: the skip IS the guarantee — release the
          // probe's read transaction (Derby refuses to close inside one)
          conn.rollback()
        }
      } catch { case e: Throwable => conn.rollback(); throw e }
      finally conn.close()
    }
  }
}
