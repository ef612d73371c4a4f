package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.format.GraftDataset

/** Import/export surface (SURVEY.md §2.1) — the reference's
  * from_file/from_csv/from_dataframes importers
  * (muller/api/dataset/import_data.py:16-126) and to_parquet/to_json/
  * to_dataframe/to_arrow exporters (muller/core/dataset/export_data,
  * dataset.py:1589-1676), re-expressed over Spark's native sources/sinks.
  *
  * `to_arrow`/`to_dataframe` need no code: a DataFrame IS the columnar,
  * Arrow-convertible handle. `to_mindrecord` is intentionally out of
  * scope (proprietary trainer format; the parquet export covers the
  * interchange need).
  */
object IO {

  // ---- imports ------------------------------------------------------------

  /** CSV import (reference `muller.from_csv`). `pathColumns` name columns
    * whose values are file paths to ingest as binary media — each becomes
    * `<col>_bytes` via a distributed join against `binaryFile` reads
    * (reference reads them per-row in workers, csv_add_data.py:14).
    */
  def fromCsv(spark: SparkSession, path: String,
              schema: Option[StructType] = None,
              pathColumns: Seq[String] = Nil,
              header: Boolean = true): DataFrame = {
    val base = spark.read.option("header", header.toString)
    val df = schema.fold(base.option("inferSchema", "true"))(base.schema)
      .csv(path)
    pathColumns.foldLeft(df)((d, c) => attachBinary(d, c))
  }

  /** JSON-lines import (reference `muller.from_file` with a schema dict). */
  def fromJson(spark: SparkSession, path: String,
               schema: Option[StructType] = None): DataFrame =
    schema.fold(spark.read)(spark.read.schema).json(path)

  /** Ingest a DataFrame into a new versioned table (reference
    * `muller.from_dataframes`).
    */
  def fromDataFrame(df: DataFrame, root: String,
                    message: String = "import"): GraftDataset = {
    val ds = GraftDataset.create(df.sparkSession, root,
      df.schema.asInstanceOf[StructType])
    ds.append(df)
    ds.commit(message)
    ds
  }

  /** Media-file ingest (reference `muller.read` + Sample,
    * api/read.py:21-49): read a directory of media files as
    * (path, length, content-bytes) via the binaryFile source.
    */
  def readBinaryFiles(spark: SparkSession, dir: String,
                      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select(col("path"), col("length"), col("content"))

  /** Attach media bytes to rows whose `pathCol` holds file paths as a new
    * `<pathCol>_bytes` column. Distinct paths are read ONCE each, inside
    * executor tasks via the Hadoop FileSystem (works for local/HDFS/S3;
    * no driver-side file reads), then joined back — so a million rows
    * referencing the same asset cost one read plus a shuffle.
    */
  def attachBinary(df: DataFrame, pathCol: String): DataFrame = {
    val spark = df.sparkSession
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    import spark.implicits._
    val bytes = df.select(col(pathCol)).distinct().as[String]
      .mapPartitions { it =>
        it.map { p =>
          val path = new org.apache.hadoop.fs.Path(p)
          val fs = path.getFileSystem(confBc.value.value)
          val in = fs.open(path)
          try (p, in.readAllBytes()) finally in.close()
        }
      }.toDF(pathCol, s"${pathCol}_bytes")
    df.join(bytes, Seq(pathCol), "left")
  }

  // ---- exports ------------------------------------------------------------

  /** Parquet export (reference `write_to_parquet`, to_parquet.py:10-25). */
  def toParquet(df: DataFrame, path: String,
                columns: Seq[String] = Nil): Unit = {
    val proj = if (columns.isEmpty) df else df.select(columns.map(col): _*)
    proj.write.mode("overwrite").parquet(path)
  }

  /** Partitioned JSON export (reference `to_json`, to_json.py:44-80 —
    * `num_workers` ≡ partition count).
    */
  def toJson(df: DataFrame, path: String, numPartitions: Int = 0): Unit = {
    val d = if (numPartitions > 0) df.repartition(numPartitions) else df
    d.write.mode("overwrite").json(path)
  }
}
