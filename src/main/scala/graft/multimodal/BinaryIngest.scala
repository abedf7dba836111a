package graft.multimodal

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IO21 — `binaryFile` ingest: the front door for multimodal corpora
  * that arrive as FILES ON DISK (images, audio, fetched payloads) —
  * Spark's built-in binary source reads (path, length, content) with
  * distributed file listing and per-file tasks, which is exactly how
  * the D12/MM asset table is born in a real deployment (the synthetic
  * generator stands in elsewhere). The entry ingests a deterministic
  * payload directory, emits per file its name, byte length, payload
  * md5 AND a `matches_source` fidelity witness (the payload hashed
  * back against the source row it was written from — a corrupted or
  * truncated ingest shows up as false), and the DuckDB oracle reads
  * THE SAME files through its own `read_blob` — two engines
  * independently ingesting one binary directory.
  *
  * The fixture write (one file per sampled doc, driver-side NIO) is
  * the one-time stand-in for the upstream fetcher that produced the
  * files; process-memoized like every fixture. The OPERATOR path —
  * listing, reading, hashing, joining — is fully distributed. */
object BinaryIngest {

  private val built =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** One .bin file per sampled document, zero-padded names for stable
    * lexical order. */
  def fixtureDir(s: SparkSession, dir: String): String = {
    val base = "/tmp/graft_warehouse/binaryingest_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + ProcessHandle.current().pid()
    if (built.add(base)) {
      Files.createDirectories(Paths.get(base))
      Tables.documents(s, dir).filter(col("doc_id") % 10 === 0)
        .select("doc_id", "text").collect().foreach { r =>
          Files.write(Paths.get(base, f"doc_${r.getLong(0)}%07d.bin"),
            r.getString(1).getBytes(StandardCharsets.UTF_8))
        }
    }
    base
  }

  def ingest(s: SparkSession, dir: String): DataFrame = {
    val path = fixtureDir(s, dir)
    val files = s.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(path)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
        col("length").cast("long").as("n_bytes"),
        md5(col("content")).as("payload_md5"),
        regexp_extract(col("path"), "doc_0*([0-9]+)\\.bin$", 1)
          .cast("long").as("doc_id"))
    val src = Tables.documents(s, dir).filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("src_md5"))
    files.join(src, Seq("doc_id"))
      .select(col("fname"), col("n_bytes"), col("payload_md5"),
        (col("payload_md5") === col("src_md5")).as("matches_source"))
      .orderBy("fname")
  }

  /** Oracle path re-rendered at dump time against the dir THIS entry
    * last ran on (QueryDef.dirOracle — per-entry, not a module global:
    * r12 ADVICE item 5's cross-dataset hazard class). */
  val qBinaryIngestDef: QueryDef = QueryDef.dirOracle(
    "io_binary_ingest",
    (s, d) => ingest(s, d),
    dir => {
      val base = "/tmp/graft_warehouse/binaryingest_" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
        ProcessHandle.current().pid()
      s"""WITH f AS (SELECT parse_filename(filename) AS fname,
                   CAST(size AS BIGINT) AS n_bytes,
                   md5(CAST(content AS VARCHAR)) AS payload_md5,
                   CAST(regexp_extract(parse_filename(filename),
                     'doc_0*([0-9]+)\\.bin', 1) AS BIGINT) AS doc_id
            FROM read_blob('$base/*.bin')),
          s AS (SELECT doc_id, md5(text) AS src_md5 FROM documents
                WHERE doc_id % 10 = 0)
          SELECT fname, n_bytes, payload_md5,
                 (payload_md5 = src_md5) AS matches_source
          FROM f JOIN s USING (doc_id)
          ORDER BY fname"""
    })

  def all: Seq[QueryDef] = Seq(qBinaryIngestDef)
}
