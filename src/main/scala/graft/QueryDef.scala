package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One driver-checkable query: a Spark builder plus (optionally) the
  * equivalent DuckDB SQL oracle. Queries without an oracle get the
  * driver's weaker rows-only check (non-SQL-expressible ops).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Exact-arithmetic helpers shared by catalog queries: Spark and DuckDB
    * double SUMs are order-dependent, so oracle-checked aggregates go
    * through exact decimal (2-dec money) or scaled-int64 (floats) forms —
    * bit-identical across engines, then cast to DOUBLE for a stable output
    * schema.
    */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")
  def sumMoney(c: Column): Column = sum(dec2(c)).cast("double")
  def avgMoney(c: Column): Column = sum(dec2(c)).cast("double") / count(lit(1))
}
