package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.{FormatQueries, RelationalQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in the `graft.catalog` package as `QueryDef`s (Spark
  * builder + DuckDB oracle SQL); this object just flattens them into the
  * driver's maps.
  */
object SparkEntry {

  val catalog: Seq[QueryDef] =
    RelationalQueries.all ++ TextQueries.all ++ VectorQueries.all ++
      FormatQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    catalog.head.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
