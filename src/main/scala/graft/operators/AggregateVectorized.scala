package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-native equivalent of MULLER's `aggregate_vectorized`
  * (reference: muller/core/query/aggregate_vectorized.py:32-140).
  *
  * Reference semantics preserved:
  *   - one aggregate METHOD per call, ∈ {count, sum, avg, min, max};
  *   - `aggregateTensors == Seq("*")` only valid for count;
  *   - `orderBy` over group keys or aggregated outputs, one direction
  *     (ASC/DESC) for all order keys (aggregate_vectorized.py:66-80);
  *   - output columns = groupBy keys ++ `<method>_<tensor>` aggregates.
  *
  * On Spark this is a single hash aggregate with map-side partial
  * aggregation + range-partitioned sort — the reference's
  * one-hot-matmul kernel (aggregate_vectorized.py:84-140) is replaced by
  * Tungsten codegen, and it spills instead of OOMing at scale.
  */
object AggregateVectorized {

  def apply(df: DataFrame,
            groupBy: Seq[String],
            aggregateTensors: Seq[String],
            method: String,
            orderBy: Seq[String] = Nil,
            direction: String = "ASC"): DataFrame = {
    val m = method.toLowerCase
    val aggs: Seq[Column] = aggregateTensors.map {
      case "*" if m == "count" => count(lit(1)).as("count_all")
      case "*" => throw new IllegalArgumentException(
        s"'*' only valid with count, not $m")
      case t => (m match {
        case "count" => count(col(t))
        case "sum"   => sum(col(t))
        case "avg"   => avg(col(t))
        case "min"   => min(col(t))
        case "max"   => max(col(t))
        case other   => throw new IllegalArgumentException(s"bad method $other")
      }).as(s"${m}_$t")
    }
    val grouped =
      if (groupBy.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
    if (orderBy.isEmpty) grouped
    else {
      val keys = orderBy.map(c =>
        if (direction.equalsIgnoreCase("DESC")) col(c).desc else col(c).asc)
      grouped.orderBy(keys: _*)
    }
  }
}
