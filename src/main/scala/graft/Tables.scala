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
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true",
      // local FS without libhadoop natives fork/execs `chmod`/`readlink`
      // on every create/mkdirs/FileContext-rename — measured as the
      // largest non-idle driver bucket on the streaming/CDC family
      // (plans/r22/stacks_q121_q105.txt). These subclasses keep stock
      // Hadoop semantics and use NIO syscalls instead; cluster
      // filesystems (HDFS/object stores) never had this tax — see
      // graft.format.NioLocalFs.
      "spark.hadoop.fs.file.impl" -> "graft.format.NioLocalFileSystem",
      "spark.hadoop.fs.AbstractFileSystem.file.impl" ->
        "graft.format.NioLocalFs")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // The driver has generated events.ts in two encodings across rounds:
    // long nanoseconds (read as long via nanosAsLong) and plain
    // timestamp[us] (arrives as TIMESTAMP_NTZ). Normalize both to
    // session-local TimestampType so downstream unix_micros/filters match
    // DuckDB's epoch_us on the same file (session tz is pinned to UTC, so
    // the NTZ→LTZ cast is value-preserving).
    if (name == "events") df.schema("ts").dataType match {
      case LongType =>
        // truncate ns→µs with INTEGRAL division: `/` is double division,
        // and ns epochs (~1.7e18) exceed double's exact integer range, so
        // a cast-back can land ±1µs off DuckDB's exact truncation
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
    else df
  }

  /** Register every table as a temp view so spark.sql(...) works. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
