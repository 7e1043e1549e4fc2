package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CatalogQueries, DataPlaneQueries, PipelineQueries, QueryDef, Relational, SourceQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator family contributes a `Seq[QueryDef]` (Spark impl + DuckDB
  * oracle SQL side by side); this object only aggregates them.
  */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    Relational.defs ++ CatalogQueries.defs ++ DataPlaneQueries.defs ++
      PipelineQueries.defs ++ SourceQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
