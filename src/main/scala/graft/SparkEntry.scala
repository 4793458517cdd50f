package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{DataPipeline, Events, QueryDef, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2.b); each
  * entry with an `oracleSql` is hash-checked against DuckDB on the same
  * parquet tables, the rest get a rows-only check.
  */
object SparkEntry {

  def allQueries: Seq[QueryDef] = Relational.all ++ DataPipeline.all ++ Events.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q9_topk_revenue.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
