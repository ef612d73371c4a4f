package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Query→shard routing for the graph ANN families ([[Hnsw]], [[Vamana]]).
  *
  * Both families build one subgraph per partition and historically probed
  * EVERY shard per query — parallel, but linear in shard count: at 100 TB
  * with 10^4 shards that is 10^4 beam walks for a k=10 answer. Routing
  * makes graph search sub-linear the same way IVF's nprobe does for cells
  * (reference muller/core/vector/algorithms/faiss_index.py:133-272):
  *
  *   - at BUILD time, rows are assigned to shards by nearest coarse
  *     centroid (k-means over a deterministic sample — the exact machinery
  *     [[VectorSearch.ivfBuild]] already uses) instead of round-robin, so
  *     a shard is a region of vector space, not a random sample of it;
  *     each shard's trained centroid is persisted as a sentinel row inside
  *     the shard itself (and, at the format layer, as a tiny `routing`
  *     artifact read without touching the graph);
  *   - at SEARCH time, each query walks only its `p` nearest shards by
  *     centroid distance. Probe-all (`probeParts = 0`) remains the default
  *     and the exactness fallback.
  *
  * Safety property: a shard with NO persisted centroid (an index built
  * before routing existed, or `clustered = false`) is outside
  * [[Routing.routedParts]] and is ALWAYS probed — routing can only prune
  * shards it has provably seen a centroid for, so it never silently drops
  * corpus regions.
  *
  * Why routing needs the clustered build: over round-robin shards every
  * centroid approximates the global mean and top-p selection is
  * uninformative; over k-means shards the query's true neighbors
  * concentrate in the nearest few cells — the IVF argument verbatim.
  *
  * Driver cost: the routing decision is O(|queries| x |shards| x dim)
  * driver-side flops over the collected centroids — the same shape as
  * the reference's faiss IVF coarse quantizer, and bounded because both
  * factors are: the query batch is already driver-held (it rides the
  * task closure), and |shards| tracks build parallelism (10^3-10^4 at
  * 100 TB — a few hundred MB-flops per batch, microseconds to
  * milliseconds). A batch large enough to strain this should be
  * mapPartitions-joined against the index, not routed one closure at a
  * time.
  */
object GraphRouting {

  /** A routing decision for one query batch.
    *
    * @param queryParts  per query id, the shard ids its walk may probe
    * @param routedParts every shard id that HAS a centroid; shards outside
    *                    this set are probed unconditionally (see above)
    */
  final case class Routing(queryParts: Map[Long, Set[Int]],
                           routedParts: Set[Int]) {

    /** May `qid` probe `part`? Unrouted parts: always. */
    def allowed(qid: Long, part: Int): Boolean =
      !routedParts.contains(part) ||
        queryParts.get(qid).forall(_.contains(part))

    /** Is `part` probed by ANY query in the batch? (Drives scan pruning:
      * on a `partitionBy("part")` layout this prunes whole directories.)
      */
    def partKept(part: Int): Boolean =
      !routedParts.contains(part) ||
        queryParts.valuesIterator.exists(_.contains(part))

    /** Column form of [[partKept]] — references only `part`, so Catalyst
      * partition-prunes it on a part-partitioned read.
      */
    def scanFilter: Column = {
      val selected = queryParts.valuesIterator.flatten.toSeq.distinct
      val routed = routedParts.toSeq
      val notRouted =
        if (routed.isEmpty) lit(false)
        else not(col("part").isin(routed.map(Int.box): _*))
      if (selected.isEmpty) notRouted
      else col("part").isin(selected.map(Int.box): _*) || notRouted
    }
  }

  /** Assign every row of `df` to one of `parts` coarse k-means shards.
    * Returns (df + int `cell` column — null for null/wrong-dim vectors —
    * and the trained (shardId, centroid) array, empty when `df` has no
    * vectors to sample). Deterministic: [[VectorSearch.ivfSample]] seeds +
    * fixed Lloyd refinement, no RNG.
    */
  def assignShards(df: DataFrame, vecCol: String, idCol: String,
                   parts: Int, refineIters: Int = 1)
      : (DataFrame, Array[(Int, Array[Float])]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val sampled = VectorSearch.ivfSample(df, vecCol, idCol, parts).collect()
    if (sampled.isEmpty) return (df, Array.empty)
    val seeded = sampled.toIndexedSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1)) }
      .toDF("cell", "_centroid")
    val cents = VectorSearch.ivfRefine(df, vecCol, seeded, refineIters)
    val arr = cents.collect()
      .map(r => (r.getAs[Int]("cell"), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    (VectorSearch.assignCells(df, vecCol, cents), arr)
  }

  /** The persisted per-shard centroids of a graph index: its sentinel
    * rows (`node == sentinelNode`), collected. Bounded by the shard
    * count — the same boundedness class as the IVF centroid reads.
    */
  def centroidsOf(index: DataFrame, sentinelNode: Int)
      : Array[(Int, Array[Float])] =
    index.filter(col("node") === lit(sentinelNode))
      .select(col("part").cast("int"), col("vec"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))

  /** Top-`p` shards for one query by squared-L2 to the shard centroids
    * (ties broken by shard id — deterministic). Fails loudly on a
    * dimension mismatch: routing a wrong-dimensional query by prefix
    * distance would confidently select arbitrary shards and return
    * plausible-looking garbage, where the exact paths would surface the
    * mismatch.
    */
  def route(cents: Array[(Int, Array[Float])], q: Array[Float],
            p: Int): Set[Int] =
    cents.map { case (part, c) =>
      require(c.length == q.length,
        s"routing dimension mismatch: query has ${q.length} dims, " +
          s"shard $part centroid has ${c.length}")
      var s = 0.0; var i = 0
      while (i < c.length) { val d = q(i) - c(i); s += d * d; i += 1 }
      (s, part)
    }.sortBy(identity).take(math.max(p, 1)).map(_._2).toSet

  /** Routing for a query batch: each query gets its own top-`p` set. */
  def routesFor(cents: Array[(Int, Array[Float])],
                queries: Seq[(Long, Array[Float])], p: Int): Routing =
    Routing(
      queries.map { case (qid, q) => qid -> route(cents, q, p) }.toMap,
      cents.map(_._1).toSet)
}
