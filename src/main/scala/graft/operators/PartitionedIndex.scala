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
  * build time governs task memory either way. Two guards keep the
  * planning cost bounded:
  *   - the parquet schema is inferred ONCE (first child + `basePath`,
  *     which keeps the `part` column) and passed explicitly to every
  *     child scan — N listing passes, 1 footer-inference pass;
  *   - past `maxParts` directories the per-query union plan would cost
  *     more in driver analysis than the Exchange it avoids, so the
  *     caller is told to fall back to the shuffled path (a single plain
  *     scan could not substitute: Spark splits large files across tasks
  *     by `maxPartitionBytes`, breaking the whole-part-per-task
  *     invariant the searchers rely on — one Exchange restores it).
  */
private[graft] object PartitionedIndex {

  /** Default union-width ceiling — comfortably above real build
    * parallelism for a suite-scale index, comfortably below the plan
    * widths where Catalyst analysis dominates small-k search latency.
    */
  val DefaultMaxParts = 1024

  /** The shard ids that exist on disk as `part=N` directories — the
    * ground truth a routing decision is healed against
    * ([[GraphRouting.heal]]): a routing artifact can claim shards a
    * crash-interrupted rewrite already removed. None when `path` itself
    * is missing or holds no parseable part directories (a
    * non-partitioned layout — the caller falls back to the shuffled
    * path, where routing is re-derived from the index's own sentinels
    * and staleness is structurally impossible). One listing RPC.
    */
  def partIds(spark: SparkSession, path: String): Option[Set[Int]] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val ids = fs.listStatus(p)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("part="))
      .flatMap(s => scala.util.Try(
        s.getPath.getName.stripPrefix("part=").toInt).toOption)
      .toSet
    if (ids.isEmpty) None else Some(ids)
  }

  /** One `coalesce(1)` scan per `part=N` directory, unioned; None when
    * `path` has no part directories or has MORE than `maxParts` of them
    * (caller falls back to the shuffled path). The `basePath` option
    * keeps the `part` partition column in each child's schema.
    *
    * `keep` prunes directories BEFORE any scan is planned — the shard-
    * routing read path ([[GraphRouting]]): with `keep = routing.partKept`
    * only the routed directories are listed into the plan, so a p-of-P
    * probe reads p directories, not P. A directory whose name does not
    * parse as `part=<int>` is conservatively kept.
    */
  def partScans(spark: SparkSession, path: String,
                maxParts: Int = DefaultMaxParts,
                keep: Int => Boolean = _ => true): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val dirs = fs.listStatus(p)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("part="))
      .filter { s =>
        val id = s.getPath.getName.stripPrefix("part=")
        scala.util.Try(id.toInt).map(keep).getOrElse(true)
      }
    if (dirs.isEmpty || dirs.length > maxParts) None
    else {
      val sorted = dirs.sortBy(_.getPath.getName)
      // infer once, reuse for every child: per-child footer inference at
      // the documented "low thousands of parts" would dominate planning
      val schema = spark.read.option("basePath", path)
        .parquet(sorted.head.getPath.toString).schema
      Some(sorted
        .map(d => spark.read.option("basePath", path).schema(schema)
          .parquet(d.getPath.toString).coalesce(1))
        .reduce(_ unionByName _))
    }
  }
}
