package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7. */
object SparkEntry {

  /** All implemented coverage-checklist entries. */
  def allDefs: Seq[QueryDef] =
    operators.Relational.all ++ operators.TpchMore.all ++
      operators.SpatialJoin.all ++ operators.SemiStructured.all ++ operators.Partitioned.all ++
      operators.Zorder.all ++ operators.EventAnalytics.all ++
      operators.Graph.all ++ operators.Triangles.all ++
      operators.Bucketed.all ++ operators.BloomFilters.all ++ operators.Ranks.all ++ operators.RowGroups.all ++
      operators.CodecAudit.all ++ multimodal.BinaryIngest.all ++
      operators.Evaluate.all ++ operators.Conformal.all ++ operators.Audit.all ++ operators.Markov.all ++
      operators.Survival.all ++ etl.Contract.all ++
      operators.Features.all ++ operators.Allocate.all ++ operators.Compaction.all ++
      operators.Retail.all ++ operators.Diagnose.all ++
      operators.Kmv.all ++ etl.Ivm.all ++ etl.Profile.all ++
      dedup.CorpusStats.all ++
      etl.EtlQueries.all ++ etl.Geo.all ++ etl.Linkage.all ++ etl.GoldenRecord.all ++ etl.LateDim.all ++ etl.Pseudonymize.all ++ etl.Masking.all ++ etl.Quality.all ++ etl.Scd.all ++ etl.Bitemporal.all ++ etl.Cdc.all ++
      etl.Incremental.all ++ etl.Repair.all ++ etl.AggNavigator.all ++
      etl.Retention.all ++ etl.Erasure.all ++ etl.SubjectExport.all ++ etl.DeltaAttribution.all ++ etl.Fx.all ++
      dedup.PipelineQueries.all ++ dedup.IncrementalClusters.all ++ dedup.InvertedIndex.all ++
      dedup.HybridRetrieval.all ++
      dedup.ParagraphDedup.all ++
      dedup.Layout.all ++ dedup.Waterfall.all ++ similarity.Project.all ++ similarity.IvfMaintain.all ++
      similarity.Kcenter.all ++
      dedup.SourceOverlap.all ++
      streaming.StreamQueries.all ++ streaming.WatermarkPlan.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.queryMap(allDefs)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueryDef.oracleMap(allDefs)
}
