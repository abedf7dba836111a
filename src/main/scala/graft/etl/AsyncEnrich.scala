package graft.etl

import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.{Executors, ThreadFactory}

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{IntegerType, StringType}

/** E4b: rate-limited async per-record external enrichment — the one
  * reference capability (per-record HTTP lookups against a remote API)
  * whose semantics a pure column expression cannot carry: bounded
  * in-flight concurrency, per-record retry with backoff, and
  * error-as-data instead of task failure.
  *
  * Reference: `GoogleApiService.cs:66-81` (geocode/elevation/timezone
  * calls per record) driven through a TPL Dataflow `TransformBlock`
  * with `TransformMaxDegreeOfParallelism = 5`
  * (`DataflowProcessor.cs:216`, `Utilities/Constants.cs:21`). The
  * Spark-first re-expression keeps Spark's OWN parallelism model for
  * distribution (partitions) and reproduces the reference's
  * per-pipeline bound PER PARTITION: each task keeps at most
  * `maxInFlight` requests outstanding in a sliding window, so a
  * 1000-executor job bounds the aggregate request rate at
  * `maxInFlight × running tasks` — the knob a real deployment tunes
  * against the API quota. Rows stream through the window in input
  * order; nothing is collected.
  *
  * This stays the SECOND choice for enrichment at 100 TB — the
  * default E4 path is a pure expression / broadcast dim join
  * (SURVEY §4): at that scale you pre-materialize the lookup table.
  * E4b exists for the long tail that genuinely must call out
  * per-record; the transport is deterministic and offline here (the
  * container has no egress), and a production transport would be a
  * blocking HTTP call on the same pool thread — exactly how a bounded
  * TransformBlock delegate behaves.
  *
  * Failure contract: a record that still fails after `maxAttempts`
  * lands with `enriched = null` and the message in `enrich_error`;
  * the job never dies on a bad record (the reference marks the ledger
  * row Error and carries on — `DataflowProcessor.cs:286-303`).
  */
object AsyncEnrich {

  /** (key, attempt) → payload; throws to signal a failed attempt.
    * Runs on the operator's pool thread — a real implementation does
    * its blocking HTTP call here. */
  type Transport = (String, Int) => String

  // Per-executor daemon pool. Sizing is NOT the concurrency bound —
  // the sliding window below is; the pool only needs enough threads
  // to carry every partition's window on this executor.
  @transient private lazy val ec: ExecutionContext =
    ExecutionContext.fromExecutor(Executors.newCachedThreadPool(
      new ThreadFactory {
        private val n = new AtomicInteger(0)
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-async-enrich-${n.incrementAndGet()}")
          t.setDaemon(true)
          t
        }
      }))

  /** Appends `enriched` (payload or null), `enrich_attempts`,
    * `enrich_error` (null on success) to every row, calling
    * `transport(keyCol value, attempt)` with at most `maxInFlight`
    * calls outstanding per partition and exponential backoff
    * (`backoffMs × 2^(attempt-1)`) between a record's attempts. */
  def enriched(df: DataFrame, keyCol: String, transport: Transport,
      maxInFlight: Int = 5, maxAttempts: Int = 3,
      backoffMs: Long = 5L): DataFrame = {
    require(maxInFlight >= 1 && maxAttempts >= 1)
    val outSchema = df.schema
      .add("enriched", StringType)
      .add("enrich_attempts", IntegerType)
      .add("enrich_error", StringType)
    val keyIdx = df.schema.fieldIndex(keyCol)
    df.mapPartitions { rows =>
      def submit(row: Row): Future[(String, Int, String)] = Future {
        val key = String.valueOf(row.get(keyIdx))
        var attempt = 0
        var payload: String = null
        var err: String = null
        while (payload == null && attempt < maxAttempts) {
          attempt += 1
          try {
            payload = transport(key, attempt)
            err = null
          } catch {
            case e: Exception =>
              err = s"${e.getClass.getSimpleName}: ${e.getMessage}"
              if (attempt < maxAttempts)
                Thread.sleep(backoffMs << (attempt - 1))
          }
        }
        (payload, attempt, err)
      }(ec)
      // sliding window: top up to maxInFlight, then always complete
      // the OLDEST request — bounded in-flight, input order preserved
      val window = scala.collection.mutable.Queue.empty[(Row, Future[(String, Int, String)])]
      new Iterator[Row] {
        def hasNext: Boolean = rows.hasNext || window.nonEmpty
        def next(): Row = {
          while (rows.hasNext && window.size < maxInFlight) {
            val r = rows.next()
            window.enqueue((r, submit(r)))
          }
          val (row, f) = window.dequeue()
          val (payload, attempts, err) = Await.result(f, Duration.Inf)
          Row.fromSeq(row.toSeq :+ payload :+ attempts :+ err)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic offline stub of the external API, with the failure
    * modes a real one exhibits: keys with `hash % 7 == 0` fail their
    * first attempt (transient — succeeds on retry), keys with
    * `hash % 31 == 0` fail every attempt (permanent). The hash is
    * MurmurHash3, NOT String.hashCode — hashCode's multiplier is 31,
    * so hashCode % 31 collapses to the last character's ordinal and
    * digit-suffixed keys would never hit the permanent branch. The
    * small sleep forces genuine overlap so the concurrency gauges mean
    * something. Gauges (`maxObservedConcurrent`, `totalCalls`) are
    * per-JVM instrumentation for the spec — local[n] runs in one JVM. */
  class StubTransport(simulatedLatencyMs: Long = 2L)
      extends Transport with Serializable {
    def apply(key: String, attempt: Int): String = {
      val inFlight = StubTransport.inFlight.incrementAndGet()
      StubTransport.maxObservedConcurrent.accumulateAndGet(inFlight, math.max)
      try {
        StubTransport.totalCalls.incrementAndGet()
        Thread.sleep(simulatedLatencyMs)
        val h = StubTransport.keyHash(key)
        if (h % 31 == 0)
          throw new IllegalStateException(s"permanent upstream error for $key")
        if (h % 7 == 0 && attempt == 1)
          throw new IllegalStateException(s"transient upstream error for $key")
        s"geo:$key:lat=${(h * 7919) % 18000}:lng=${(h * 104729) % 36000}"
      } finally StubTransport.inFlight.decrementAndGet()
    }
  }

  object StubTransport {
    def keyHash(key: String): Long =
      math.abs(scala.util.hashing.MurmurHash3.stringHash(key).toLong)
    val inFlight = new AtomicInteger(0)
    val maxObservedConcurrent = new AtomicInteger(0)
    val totalCalls = new AtomicInteger(0)
    def resetGauges(): Unit = {
      inFlight.set(0); maxObservedConcurrent.set(0); totalCalls.set(0)
    }
  }
}
