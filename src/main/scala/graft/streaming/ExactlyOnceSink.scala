package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger => SSTrigger}

/** S18 — END-TO-END exactly-once file sink for foreachBatch streams.
  *
  * Structured Streaming guarantees each micro-batch is DELIVERED to
  * foreachBatch at-least-once: after a crash between the sink write
  * and the checkpoint commit, the batch replays with the SAME batchId,
  * and a plain `.write.mode("append")` duplicates it (the E8 pipeline
  * carries `batch_id` downstream so consumers can dedup; this sink
  * removes the problem at the storage layer instead). The missing half
  * of exactly-once is an IDEMPOTENT sink keyed on batchId — exactly
  * how Spark's own FileStreamSink log and every lakehouse txn log work.
  *
  * Protocol (the IO14 manifest pattern applied to an append log):
  * each transaction writes its rows to a deterministic per-txn data
  * directory (`txn-<id>` — a retry after a crash OVERWRITES the
  * orphan, never duplicates it), then registers the txn in one small
  * manifest replaced by atomic rename. Readers resolve the manifest at
  * plan time and scan only REGISTERED directories: a torn write is
  * invisible, a replayed txn is skipped at the manifest check, commits
  * are O(batch) — the table is never rewritten (the scale difference
  * from a read-union-rewrite "append").
  *
  * Manifest I/O is driver-side java.nio on O(#txns) bytes — metadata
  * plane, same class as the IO14 snapshot pointer and the E6 ledger.
  */
object ExactlyOnceSink {

  private val ManifestName = "_txn_manifest.json"

  /** Committed txn ids, oldest→newest. Missing manifest = empty. */
  def committed(root: String): Seq[String] = {
    val p = Paths.get(root, ManifestName)
    if (!Files.exists(p)) Nil
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      "\"txns\"\\s*:\\s*\\[([^\\]]*)\\]".r
        .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
        .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSeq
    }
  }

  private def writeManifest(root: String, txns: Seq[String]): Unit = {
    val json = s"""{"txns":[${txns.map(t => s""""$t"""").mkString(",")}]}"""
    val tmp = Paths.get(root, s".$ManifestName.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(root, ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def sanitize(txnId: String): String =
    txnId.replaceAll("[^A-Za-z0-9_-]", "_")

  /** Idempotent append: writes `df` under txnId unless that txn is
    * already committed. Returns true iff this call committed. The data
    * write completes fully (to the txn's own dir, overwriting any
    * crash orphan) BEFORE the manifest swap registers it. */
  def appendOnce(df: DataFrame, root: String, txnId: String): Boolean = {
    Files.createDirectories(Paths.get(root))
    val txns = committed(root)
    if (txns.contains(txnId)) false
    else {
      df.write.mode("overwrite").parquet(s"$root/txn-${sanitize(txnId)}")
      writeManifest(root, txns :+ txnId)
      true
    }
  }

  /** Read the table = union of all REGISTERED txn directories. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val dirs = committed(root).map(t => s"$root/txn-${sanitize(t)}")
    require(dirs.nonEmpty, s"no committed transactions under $root")
    spark.read.parquet(dirs: _*)
  }

  /** Wire a stream to the idempotent sink: batchId is the txn id, so a
    * post-crash replay of an already-committed batch is a no-op and
    * the pipeline is exactly-once END-TO-END (checkpointed offsets ×
    * idempotent commit). */
  def attach(incoming: DataFrame, root: String, checkpointDir: String,
      postBatch: Long => Unit = _ => ()): StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(SSTrigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendOnce(batch, root, s"batch-$batchId"); postBatch(batchId); ()
      }
      .start()
}
