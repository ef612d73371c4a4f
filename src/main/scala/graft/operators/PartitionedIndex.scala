package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exchange-free scan over an index persisted with
  * `.write.partitionBy("part")`: the layout already co-locates each
  * subgraph in its own `part=N` directory, so instead of
  * `repartition(col("part"))` — a full shuffle of the index — every part
  * directory becomes one NARROW single-task scan (`coalesce(1)` merges a
  * large part's row-group splits without shuffling) and the per-part
  * scans are unioned. The search `mapPartitions` then sees exactly one
  * whole subgraph per task, which is the invariant the shuffled path
  * bought with an Exchange.
  *
  * Scale shape: the union width equals the part count, which equals the
  * build parallelism (hundreds to low thousands on a big cluster) — a
  * planning-time cost, not a data movement. Each task still materializes
  * one whole subgraph, same as the shuffled path; partition sizing at
  * build time governs task memory either way.
  */
private[graft] object PartitionedIndex {

  /** One `coalesce(1)` scan per `part=N` directory, unioned; None when
    * `path` has no part directories (caller falls back to the shuffled
    * path). The `basePath` option keeps the `part` partition column in
    * each child's schema.
    */
  def partScans(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val dirs = fs.listStatus(p)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("part="))
    if (dirs.isEmpty) None
    else Some(dirs.sortBy(_.getPath.getName)
      .map(d => spark.read.option("basePath", path)
        .parquet(d.getPath.toString).coalesce(1))
      .reduce(_ unionByName _))
  }
}
