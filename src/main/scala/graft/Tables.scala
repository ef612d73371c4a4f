package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish testdata (TESTDATA.md).
  *
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet file each under the sf dir.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session configs every entry point must set: the events table stores
    * nanosecond timestamps, which Spark's Parquet reader only accepts as
    * long when this legacy flag is on (we convert back to TimestampType in
    * [[load]]).
    */
  val requiredConfs: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      // ts arrives as long nanos (nanosAsLong) → truncate to micros with
      // INTEGRAL division: `/` is double division, and ns epochs (~1.7e18)
      // exceed double's exact integer range, so a cast-back can land ±1µs
      // off DuckDB's exact truncation
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view so spark.sql(...) works. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
