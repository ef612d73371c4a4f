package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column statistics + dataset summary — Spark-native equivalent of the
  * reference's statistics module (muller/core/dataset/statistics/
  * statistics.py:17-66 per-column min/max/mean/histogram, summary.py:33
  * schema table; surfaced via ds.summary/statistics, dataset.py:1584-1633).
  *
  * Everything is ONE aggregation pass per call (partial+final hash agg, no
  * driver loops); the histogram is a groupBy over `width_bucket`.
  */
object Statistics {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** One row per column: count / nulls / distinct (approx) and, for
    * numeric columns, min / max / mean / stddev.
    */
  def columnStatistics(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val total = count(lit(1))
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"__cnt_${f.name}"),
        approx_count_distinct(c).as(s"__dis_${f.name}")) ++
        (if (isNumeric(f.dataType)) Seq(
          min(c).cast("double").as(s"__min_${f.name}"),
          max(c).cast("double").as(s"__max_${f.name}"),
          avg(c.cast("double")).as(s"__avg_${f.name}"),
          stddev_samp(c.cast("double")).as(s"__std_${f.name}"))
        else Seq.empty)
    }
    val r = df.agg(total.as("__total"), aggs.toIndexedSeq: _*).head()
    def d(n: String): Option[Double] =
      if (r.schema.fieldNames.contains(n) && !r.isNullAt(r.fieldIndex(n)))
        Some(r.getDouble(r.fieldIndex(n))) else None
    val rows = df.schema.fields.map { f =>
      Row(f.name, f.dataType.simpleString,
        r.getAs[Long]("__total"),
        r.getAs[Long]("__total") - r.getAs[Long](s"__cnt_${f.name}"),
        r.getAs[Long](s"__dis_${f.name}"),
        d(s"__min_${f.name}").orNull, d(s"__max_${f.name}").orNull,
        d(s"__avg_${f.name}").orNull, d(s"__std_${f.name}").orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      StructType(Seq(
        StructField("column", StringType), StructField("dtype", StringType),
        StructField("rows", LongType), StructField("nulls", LongType),
        StructField("approx_distinct", LongType),
        StructField("min", DoubleType), StructField("max", DoubleType),
        StructField("mean", DoubleType), StructField("stddev", DoubleType))))
  }

  /** Approximate quantiles of a numeric column (t-digest style sketch via
    * `percentile_approx` — single pass, mergeable across partitions, the
    * scale-safe quantile path).
    */
  def quantiles(df: DataFrame, column: String,
                probs: Seq[Double]): Seq[Double] = {
    val arr = df.agg(percentile_approx(col(column).cast("double"),
        array(probs.map(lit): _*), lit(10000)).as("q"))
      .head().getSeq[Double](0)
    arr.toSeq
  }

  /** Equi-width histogram of a numeric column over [lo, hi] with `bins`
    * buckets (closed right edge on the last bucket, like width_bucket).
    */
  def histogram(df: DataFrame, column: String, lo: Double, hi: Double,
                bins: Int): DataFrame =
    df.select(least(width_bucket(col(column).cast("double"), lit(lo), lit(hi),
        lit(bins)), lit(bins)).as("bucket")) // hi itself joins the last bucket
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .withColumn("lo", lit(lo) + (col("bucket") - 1) * (lit(hi) - lit(lo)) / lit(bins))
      .withColumn("hi", lit(lo) + col("bucket") * (lit(hi) - lit(lo)) / lit(bins))
      .orderBy("bucket")
}
