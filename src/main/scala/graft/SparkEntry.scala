package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 (the operator inventory) and
  * §3.4 (the oracle path). Each registered query is a `Q` from one of the
  * category objects; `oracleSql` carries the DuckDB-equivalent SQL the driver
  * hash-compares against at sf0.01.
  */
object SparkEntry {
  /** Full operator inventory (SURVEY §2). Order: scans/filters/setops, joins,
    * aggregates, windows, stateful batch shadows, scalar kernels, LLM ops.
    */
  lazy val all: Seq[Q] =
    RelationalCore.queries ++
      Joins.queries ++
      Aggregates.queries ++
      MoreAggregates.queries ++
      Windows.queries ++
      Scalars.queries ++
      StatefulShadows.queries ++
      LlmOps.queries ++
      CustomFns.queries ++
      Workloads.queries ++
      Workloads2.queries ++
      EventAnalytics.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("d1_hash_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  lazy val oracleSql: Map[String, String] =
    all.flatMap(q =>
      q.oracle.map(sql => q.name -> sql.replaceAll("\\s+", " ").trim)).toMap
}
