package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate every catalogued operator query from
  * the per-domain batches under `graft.queries`.
  */
object SparkEntry {

  /** All query batches, in SURVEY.md §2 order. */
  def batches: Seq[QueryBatch] =
    Seq(Relational, TableOps, TextQueries, VectorQueries, StreamQueries,
      SqlQueries, ServiceQueries, OptimizerQueries, MultimodalQueries,
      CoverageQueries, TpchQueries, TpcdsQueries, ExtAnalyticsQueries,
      RankQueries, PipelineQueries)

  private lazy val catalog: Seq[GQ] = batches.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The medallion pipeline (bronze → expectations+dedup silver → gold)
    * exercises the engine end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    queries("q93_pipeline_medallion")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap

  /** Collapse the triple-quoted indentation so the JSON dump stays readable. */
  private def normalize(sql: String): String =
    sql.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")
}
