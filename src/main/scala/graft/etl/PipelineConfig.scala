package graft.etl

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}

/** E44 — CONFIG-driven pipeline assembly: the reference is steered by
  * appsettings.json + DI (`ServiceBusWorker` reads paths, TTLs and
  * run flags from configuration, never from code); graft's analogue
  * is a declarative JSON spec that resolves to the composed E1→E7
  * plan. The spec names the input and an ordered stage list that must
  * be a PREFIX of the canonical sequence — the operational "how deep
  * do we run" knob (ingest-only smoke, dedupe dry-run, full load) a
  * config file can turn without a code change. Validation is LOUD at
  * parse time: unknown stages, out-of-order or non-prefix sequences
  * and malformed JSON all fail before any job runs (the E42
  * silently-ignored-config-is-a-breach discipline). Assembly is pure
  * plan construction — the spec only chooses which existing
  * declarative transforms compose. */
object PipelineConfig {

  final case class Spec(input: String, stages: Seq[String])

  val Canonical: Seq[String] =
    Seq("ingest", "dedupe", "enrich", "exclude_processed", "upsert")

  def parse(json: String): Spec = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val spec =
      try JsonMethods.parse(json).extract[Spec]
      catch {
        case e: Exception =>
          throw new IllegalArgumentException(
            s"malformed pipeline spec: ${e.getMessage}")
      }
    require(spec.input.nonEmpty, "pipeline spec needs an input path")
    val unknown = spec.stages.filterNot(Canonical.contains)
    require(unknown.isEmpty, s"unknown stages: ${unknown.mkString(", ")}")
    require(spec.stages.nonEmpty &&
      spec.stages == Canonical.take(spec.stages.length),
      s"stages must be a prefix of ${Canonical.mkString("→")}, " +
        s"got ${spec.stages.mkString("→")}")
    spec
  }

  /** Resolve the spec to a DataFrame plan. Depth 4 is the pipeline's
    * fresh branch (records surviving the incremental exclusion);
    * depth 5 is the full E7 composition. */
  def run(s: SparkSession, spec: Spec): DataFrame = spec.stages.length match {
    case 1 => ZipEtl.ingest(s, spec.input)
    case 2 => ZipEtl.dedupeLastWins(ZipEtl.ingest(s, spec.input))
    case 3 => ZipEtl.enrich(ZipEtl.dedupeLastWins(ZipEtl.ingest(s, spec.input)))
    case 4 =>
      val deduped = ZipEtl.dedupeLastWins(ZipEtl.ingest(s, spec.input))
      ZipEtl.excludeProcessed(deduped, ZipEtl.processedBaseline(s, spec.input))
    case _ => ZipEtl.pipeline(s, spec.input)
  }

  def runJson(s: SparkSession, json: String): DataFrame = run(s, parse(json))

  val all: Seq[QueryDef] = Seq.empty // test-gated capability (E44)
}
