package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query surface is assembled from the per-family inventories; every entry
  * with an oracle participates in the DuckDB hash-compare gate, the rest get
  * rows-only checks (non-SQL-expressible planners/rewrites) backed by
  * ScalaTest specs.
  */
object SparkEntry {

  import graft.{queries => q}

  val allDefs: Seq[QueryDef] =
    q.Relational.defs ++ q.Inventory.defs ++ q.Migration.defs ++
      q.Pipeline.defs ++ q.Headline.defs ++ q.HeadlineExt.defs ++ q.Sources.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q.Headline.defs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(o => d.name -> o)).toMap
}
