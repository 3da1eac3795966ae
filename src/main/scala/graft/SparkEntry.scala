package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in operator modules (graft.operators.*) as
  * [[GraftQuery]] values; this object just concatenates the registries.
  */
object SparkEntry {

  /** Every implemented operator query, in registration order. */
  val all: Seq[GraftQuery] =
    Relational.queries ++ Temporal.queries ++ Enrichment.queries ++
      TextAnalysis.queries ++ Similarity.queries ++ EtlDecode.queries ++
      Export.queries ++ Extraction.queries ++ Portfolio.queries ++
      Media.queries ++ Pipeline.queries ++ CorpusStats.queries ++
      Scale.queries ++ graft.streaming.StreamingQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case GraftQuery(n, _, Some(sql)) => n -> sql }.toMap
}
