package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.{Metrics, PlanFeaturizer, TraceAnalytics}
import graft.operators.{Advanced, AsOf, Relational}
import graft.plans.TopKPerKey
import graft.scheduling.SchedulingQueries
import graft.sources.{Ingest, SyntheticWorkload, TpcdsPromoted}
import graft.llm.{Curation, Dedup, LinkGraph, Multimodal, Retrieval, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named
  * query in [[queries]]; [[oracleSql]] carries the DuckDB-equivalent
  * ANSI SQL for the hash-compare gate (omitted only for operators that
  * are not SQL-expressible, which get a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-DS q1's correlated-scalar-subquery shape (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    Advanced.queries("correlated_scalar_subquery")(
      spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Advanced.queries ++ AsOf.queries ++
      TopKPerKey.queries ++ graft.operators.Scale.queries ++
      TraceAnalytics.queries ++
      Metrics.queries ++ PlanFeaturizer.queries ++
      SchedulingQueries.queries ++ Ingest.queries ++ TpcdsPromoted.queries ++
      SyntheticWorkload.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      Retrieval.queries ++ LinkGraph.queries ++
      Multimodal.queries ++ Curation.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Advanced.oracles ++ AsOf.oracles ++
      TopKPerKey.oracles ++ graft.operators.Scale.oracles ++
      TraceAnalytics.oracles ++
      Metrics.oracles ++ SchedulingQueries.oracles ++ Ingest.oracles ++
      TpcdsPromoted.oracles ++ SyntheticWorkload.oracles ++
      TextAnalysis.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      Retrieval.oracles ++ LinkGraph.oracles ++
      Multimodal.oracles ++ Curation.oracles
}
