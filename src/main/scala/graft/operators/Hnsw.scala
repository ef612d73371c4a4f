package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable

/** HNSW graph ANN — the reference's HNSWFLAT index type
  * (muller/core/vector/algorithms/faiss_index.py:133-272) re-designed for
  * Spark's execution model: one navigable-small-world graph PER PARTITION
  * (built where the data lives, no native libs), persisted as ordinary
  * rows, searched with a per-partition greedy descent and a global
  * TakeOrderedAndProject merge of the local top-k sets.
  *
  * Why per-partition graphs: a single global HNSW needs random access to
  * the whole corpus (the faiss/driver model — bounded by one machine's
  * RAM). Sharded subgraphs keep the build embarrassingly parallel, bound
  * memory by partition size, and the search cost is
  * `numPartitions × O(ef·log n_p)` — each partition's probe is
  * logarithmic, and partitions probe concurrently. This is the same
  * sharding strategy distributed faiss deployments use. With a CLUSTERED
  * build (`clustered = true` + `probeParts = p` on the searchers — see
  * [[GraphRouting]]) the cost drops to `p × O(ef·log n_p)`: each query
  * walks only its p nearest shards by persisted centroid, reading only
  * p part directories on the persisted layout.
  *
  * Determinism: node levels come from a murmur3 hash of the node's
  * insertion sequence (not a RNG), so a rebuild of the same partition
  * yields the same graph.
  */
object Hnsw {

  /** In-memory graph over one partition's vectors (L2 metric).
    *
    * r22: the hot loops (searchLayer's frontier heaps + visited set, the
    * backlink prune) run on primitive structures ([[GraphPrims]]) instead
    * of boxed `(Double, Int)` priority queues and `HashSet[Int]` — the
    * heap replicates scala PriorityQueue's algorithm verbatim and the
    * sort is stable like the one it replaces, so the built graphs and
    * search results are BIT-IDENTICAL (GraphEquivalenceSpec pins
    * adjacency + hits against the pre-rewrite implementation on fixed
    * seeds). Allocation per candidate drops to zero, which is what the
    * 32-way concurrent builds were GC-bound on (VERDICT r21 #2/#4).
    */
  final class Graph(val m: Int, val efConstruction: Int) extends Serializable {
    import GraphPrims.{DistHeap, IntVec, ScoredBuf}
    // m = 0 builds an EDGELESS graph (take(0) neighbor selection) that
    // silently answers ~1 hit per shard; m = 1 makes mL infinite (every
    // node at level 31). Both are degenerate, never useful — refuse.
    require(m >= 2, s"HNSW degree m must be >= 2, got $m")
    require(efConstruction >= 1, s"bad efConstruction $efConstruction")
    private val mL = 1.0 / math.log(m.toDouble)
    private val maxM0 = 2 * m
    val vecs = mutable.ArrayBuffer[Array[Float]]()
    val extIds = mutable.ArrayBuffer[Long]()
    val levels = mutable.ArrayBuffer[Int]()
    // neighbors(node)(level) = adjacency list
    val nbrs = mutable.ArrayBuffer[Array[IntVec]]()
    var entry: Int = -1

    private def dist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }

    /** Deterministic exponential level: hash → uniform(0,1) → -ln(u)·mL. */
    private def levelOf(seq: Int): Int = {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(seq, 777)
      val u = ((h >>> 8).toDouble + 0.5) / (1 << 24).toDouble
      math.min((-math.log(u) * mL).toInt, 31)
    }

    /** Greedy beam search on one layer from `eps` (first `epsLen` ids),
      * beam width `ef`. Returns hits ascending by dist (stable — tie
      * order matches the boxed PriorityQueue drain + stable sort).
      */
    private def searchLayer(q: Array[Float], eps: Array[Int], epsLen: Int,
                            ef: Int, level: Int): ScoredBuf = {
      val visited = new java.util.BitSet(vecs.length)
      // candidates: nearest-first; results: farthest-first (bounded by ef)
      val cand = new DistHeap(nearestFirst = true)
      val res = new DistHeap(nearestFirst = false)
      var ei = 0
      while (ei < epsLen) {
        val e = eps(ei)
        if (!visited.get(e)) {
          visited.set(e)
          val d = dist(q, vecs(e)); cand.enqueue(d, e); res.enqueue(d, e)
        }
        ei += 1
      }
      while (cand.nonEmpty) {
        val dc = cand.headDist; val c = cand.headNode; cand.dequeue()
        if (res.nonEmpty && dc > res.headDist && res.size >= ef) cand.clear()
        else {
          val adj = nbrs(c)
          if (level < adj.length) {
            val a = adj(level)
            var i = 0
            while (i < a.length) {
              val n = a(i)
              if (!visited.get(n)) {
                visited.set(n)
                val d = dist(q, vecs(n))
                if (res.size < ef || d < res.headDist) {
                  cand.enqueue(d, n); res.enqueue(d, n)
                  if (res.size > ef) res.dequeue()
                }
              }
              i += 1
            }
          }
        }
      }
      val out = new ScoredBuf(res.size + 1)
      while (res.nonEmpty) {
        out.add(res.headDist, res.headNode); res.dequeue()
      }
      out.stableSortByDist()
      out
    }

    private def searchLayer1(q: Array[Float], ep: Int, level: Int): Int = {
      oneEp(0) = ep
      searchLayer(q, oneEp, 1, 1, level).node(0)
    }
    private val oneEp = new Array[Int](1)

    def insert(id: Long, v: Array[Float]): Unit = {
      // loud on mixed dimensions: a shorter vector would insert under
      // PREFIX distance and a longer one crashes later searches mid-walk
      // with an opaque AIOOBE — the clustered build drops wrong-dim rows
      // at cell assignment, the round-robin build has no reference dim
      // until its first row, so the graph itself holds the contract
      require(vecs.isEmpty || v.length == vecs(0).length,
        s"vector for id $id has ${v.length} dims, graph holds " +
          s"${vecs(0).length}-dim vectors")
      val node = vecs.length
      val lvl = levelOf(node)
      vecs += v; extIds += id; levels += lvl
      nbrs += Array.fill(lvl + 1)(new IntVec())
      if (entry < 0) { entry = node; return }
      var ep = entry
      val topLvl = levels(entry)
      // greedy descend above the node's level
      var l = topLvl
      while (l > lvl) {
        ep = searchLayer1(v, ep, l)
        l -= 1
      }
      // connect at each level from min(topLvl, lvl) down to 0
      l = math.min(topLvl, lvl)
      var eps = new Array[Int](1); eps(0) = ep; var epsLen = 1
      val pruneBuf = new ScoredBuf(maxM0 + 2)
      while (l >= 0) {
        val cands = searchLayer(v, eps, epsLen, efConstruction, l)
        val cap = if (l == 0) maxM0 else m
        val nSel = math.min(m, cands.len)
        val own = nbrs(node)(l)
        var si = 0
        while (si < nSel) {
          val s = cands.node(si)
          own.add(s)
          si += 1
        }
        si = 0
        while (si < nSel) {
          val s = cands.node(si)
          val a = nbrs(s)(l)
          a.add(node)
          if (a.length > cap) {
            // prune to the cap nearest (simple heuristic; stable on ties
            // like the sortBy it replaces)
            pruneBuf.len = 0
            var i = 0
            while (i < a.length) {
              pruneBuf.add(dist(vecs(s), vecs(a(i))), a(i)); i += 1
            }
            pruneBuf.stableSortByDist()
            a.clear()
            i = 0
            while (i < cap) { a.add(pruneBuf.node(i)); i += 1 }
          }
          si += 1
        }
        if (cands.len > eps.length) eps = new Array[Int](cands.len)
        var i = 0
        while (i < cands.len) { eps(i) = cands.node(i); i += 1 }
        epsLen = cands.len
        l -= 1
      }
      if (lvl > levels(entry)) entry = node
    }

    def search(q: Array[Float], k: Int, ef: Int): Seq[(Long, Double)] = {
      if (entry < 0) return Seq.empty
      // loud on a query-dimension mismatch: a shorter query ranks every
      // stored vector by PREFIX distance — k plausible-looking wrong
      // neighbors, no error — and a longer one crashes with an opaque
      // AIOOBE; same contract as GraphRouting.route / KnnJoin's filter
      require(q.length == vecs(entry).length,
        s"query has ${q.length} dims, index vectors have " +
          s"${vecs(entry).length}")
      var ep = entry
      var l = levels(entry)
      while (l > 0) { ep = searchLayer1(q, ep, l); l -= 1 }
      oneEp(0) = ep
      val hits = searchLayer(q, oneEp, 1, math.max(ef, k), 0)
      val out = Seq.newBuilder[(Long, Double)]
      var i = 0
      val n = math.min(k, hits.len)
      while (i < n) { out += ((extIds(hits.node(i)), hits.dist(i))); i += 1 }
      out.result()
    }
  }

  private val indexSchema = StructType(Seq(
    StructField("part", IntegerType),
    StructField("node", IntegerType),
    StructField("ext_id", LongType),
    StructField("vec", ArrayType(FloatType)),
    StructField("level", IntegerType),
    StructField("adj", ArrayType(ArrayType(IntegerType))),
    StructField("entry", IntegerType)))

  /** Centroid sentinel marker in the `node` column (clustered builds
    * only): `vec` holds the shard's trained routing centroid, `ext_id`
    * the shard's node count. Graph reassembly skips `node < 0` rows.
    */
  val CentroidNode: Int = -1

  /** Build per-partition graphs; returns index rows (persist with
    * `.write.partitionBy("part")`). One pass, no shuffle beyond the
    * initial spread; memory bounded by SHARD size, which is bounded by
    * construction: when `numPartitions <= 0` the shard count is derived
    * from the CORPUS SIZE — `ceil(rows / 500)`, capped at 4096
    * ([[GraphRouting.shardsFor]]) — so every build task holds a ~500-row
    * graph no matter the corpus, instead of the O(rows/cores) graph a
    * `defaultParallelism` default would grow into at 100× data. The row
    * count comes from `rowCountHint` when the caller already knows it
    * (the format layer reads it from manifest metadata — no scan) and
    * from one `count()` pass otherwise — noise next to the graph
    * construction it sizes. An explicit `numPartitions > 0` overrides.
    *
    * `clustered = true` assigns rows to shards by nearest coarse k-means
    * centroid instead of round-robin, with a skew cap — a dominant cell
    * splits into avg-sized sub-shards sharing its centroid
    * ([[GraphRouting.assignShardsCapped]]) — and persists each shard's
    * centroid as a sentinel row: the prerequisite for sub-linear
    * shard-routed search (`probeParts` on the searchers). Falls back to
    * the round-robin build when the corpus has no vectors to train on.
    * Null-cell rows (wrong-dim vectors) are dropped — they would break
    * the walk's distance loop anyway.
    */
  def build(df: DataFrame, vecCol: String, idCol: String,
            numPartitions: Int = 0, m: Int = 16,
            efConstruction: Int = 100,
            clustered: Boolean = false,
            rowCountHint: Long = -1L): DataFrame = {
    implicit val enc = RowEncoder.encoderFor(indexSchema)
    val base = df.select(col(idCol).cast("long").as("_gid"),
        col(vecCol).as("_gvec"))
      .filter(col("_gvec").isNotNull)
    val parts =
      if (numPartitions > 0) numPartitions
      else GraphRouting.shardsFor(
        if (rowCountHint >= 0L) rowCountHint else base.count())
    if (!clustered) {
      base.repartition(parts)
        .mapPartitions { rows =>
          val g = new Graph(m, efConstruction)
          rows.foreach(r => g.insert(r.getLong(0),
            r.getSeq[Float](1).toArray))
          if (g.entry < 0) Iterator.empty
          else {
            val pid = org.apache.spark.TaskContext.getPartitionId()
            (0 until g.vecs.length).iterator.map { n =>
              Row(pid, n, g.extIds(n), g.vecs(n).toSeq, g.levels(n),
                g.nbrs(n).map(_.toSeq).toSeq, g.entry)
            }
          }
        }
    } else {
      val (assigned, cents) =
        GraphRouting.assignShardsCapped(base, "_gvec", "_gid", parts)
      if (cents.isEmpty) // pass the resolved parts: no second count()
        return build(df, vecCol, idCol, parts, m, efConstruction)
      val centMap = cents.toMap
      // hash-partition by shard: every shard's rows land wholly in one
      // task (the colocated invariant); a task may hold several shards,
      // so group and build one graph per shard
      assigned.filter(col("cell").isNotNull)
        .select(col("_gid"), col("_gvec"), col("cell").cast("int"))
        .repartition(parts, col("cell"))
        .mapPartitions { rows =>
          val byShard = mutable.LinkedHashMap[Int, Graph]()
          rows.foreach { r =>
            val g = byShard.getOrElseUpdate(r.getInt(2),
              new Graph(m, efConstruction))
            g.insert(r.getLong(0), r.getSeq[Float](1).toArray)
          }
          byShard.iterator.filter(_._2.entry >= 0).flatMap {
            case (shard, g) =>
              Iterator.single(Row(shard, CentroidNode, g.vecs.length.toLong,
                centMap(shard).toSeq, -1, Seq.empty[Seq[Int]], g.entry)) ++
                (0 until g.vecs.length).iterator.map { n =>
                  Row(shard, n, g.extIds(n), g.vecs(n).toSeq, g.levels(n),
                    g.nbrs(n).map(_.toSeq).toSeq, g.entry)
                }
          }
        }
    }
  }

  /** Per-part candidate hits for a broadcast query batch: each subgraph
    * is reassembled ONCE per task and walked once per query — one index
    * pass for N queries (the reference's batched `vector_search`,
    * vector_search_ops.py:84-101). `colocated = true` skips the
    * `repartition(col("part"))` shuffle — correct when each part's rows
    * already sit wholly within one task: a freshly-built index (build
    * emits one part per task) or [[PartitionedIndex.partScans]].
    */
  private def localHits(index: DataFrame, queries: Seq[(Long, Seq[Float])],
                        k: Int, ef: Int, colocated: Boolean,
                        routing: Option[GraphRouting.Routing] = None)
      : DataFrame = {
    val outSchema = StructType(Seq(
      StructField("query_id", LongType),
      StructField("ext_id", LongType), StructField("l2sq", DoubleType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    // the bounded query batch rides in the task closure: the task binary
    // is itself broadcast once per stage AND reclaimed with the stage, so
    // (unlike an explicit sc.broadcast, which lingers until the async
    // ContextCleaner reaps it) repeated batch searches against a
    // long-lived session leave no accumulating driver/executor state
    val qarr = queries.map { case (qid, v) => (qid, v.toArray) }.toArray
    // normalize column order/types: partitionBy moves `part` to the end
    // on read-back, and positional access below must stay stable
    val prepared = index.select(col("part").cast("int"), col("node"),
      col("ext_id"), col("vec"), col("level"), col("adj"), col("entry"))
    // routing prunes shards no query probes BEFORE the scan/shuffle —
    // partition-pruned on a partitionBy("part") read
    val scoped = routing.fold(prepared)(r => prepared.filter(r.scanFilter))
    val spread = if (colocated) scoped
      else scoped.repartition(col("part"))
    spread.mapPartitions { rows =>
      // a task may hold several parts after the repartition: regroup
      val byPart = mutable.HashMap[Int, mutable.ArrayBuffer[Row]]()
      rows.foreach(r => byPart.getOrElseUpdate(r.getInt(0),
        mutable.ArrayBuffer[Row]()) += r)
      byPart.iterator.flatMap { case (pid, rs) =>
        val g = reassemble(rs)
        qarr.iterator
          .filter { case (qid, _) => routing.forall(_.allowed(qid, pid)) }
          .flatMap { case (qid, q) =>
            g.search(q, k, ef).map { case (id, d) => Row(qid, id, d) }
          }
      }
    }
  }

  /** Rebuild one shard's in-memory graph from its persisted index rows
    * (column order part,node,ext_id,vec,level,adj,entry; sentinel rows
    * skipped). Shared by the searchers and [[KnnJoin]].
    */
  private[operators] def reassemble(rs: scala.collection.Seq[Row]): Graph = {
    val sorted = rs.filter(_.getInt(1) >= 0).sortBy(_.getInt(1))
    val g = new Graph(16, 100)
    var expect = 0
    sorted.foreach { r =>
      // adjacency lists index by POSITION: a duplicate or missing node id
      // (a doubly-appended delta shard, an interrupted rewrite) would
      // shift every later neighbor pointer onto the wrong vector —
      // silently wrong ext_ids. Loud beats plausible-looking garbage.
      require(r.getInt(1) == expect,
        s"corrupt graph shard: expected node $expect, found " +
          s"${r.getInt(1)} (duplicate or missing node rows)")
      expect += 1
      g.vecs += r.getSeq[Float](3).toArray
      g.extIds += r.getLong(2)
      g.levels += r.getInt(4)
      g.nbrs += r.getSeq[scala.collection.Seq[Int]](5)
        .map { a =>
          val v = new GraphPrims.IntVec(a.length)
          a.foreach(v.add); v
        }.toArray
    }
    g.entry = if (sorted.nonEmpty) sorted.head.getInt(6) else -1
    g
  }

  /** See [[GraphRouting.routingFor]] — shared with [[Vamana]]. */
  private def routingFor(index: DataFrame,
                         queries: Seq[(Long, Seq[Float])],
                         probeParts: Int,
                         centroids: Array[(Int, Array[Float])] = Array.empty)
      : Option[GraphRouting.Routing] =
    GraphRouting.routingFor(index, queries, probeParts, CentroidNode,
      centroids)

  /** Search a persisted (or freshly-built) index: each partition's rows
    * reassemble their graph(s) in memory, probe locally with beam `ef`,
    * and the driver merges `parts × k` candidate rows via
    * TakeOrderedAndProject — never the corpus. Pass `colocated = true`
    * on a freshly-built index to skip the part shuffle entirely.
    */
  def topK(index: DataFrame, query: Seq[Float], k: Int,
           ef: Int = 64, colocated: Boolean = false,
           probeParts: Int = 0,
           centroids: Array[(Int, Array[Float])] = Array.empty): DataFrame = {
    val qs = Seq((0L, query))
    topKRouted(index, query, k, ef, colocated,
      routingFor(index, qs, probeParts, centroids))
  }

  /** [[topK]] against a PRE-BUILT routing (the persisted read path,
    * where the routing has been healed against the real directories).
    */
  private[operators] def topKRouted(index: DataFrame, query: Seq[Float],
                                    k: Int, ef: Int, colocated: Boolean,
                                    routing: Option[GraphRouting.Routing])
      : DataFrame =
    localHits(index, Seq((0L, query)), k, ef, colocated, routing)
      .select(col("ext_id"), col("l2sq"))
      .orderBy(col("l2sq").asc_nulls_last, col("ext_id").asc)
      .limit(k)

  /** Batched search: the query batch is broadcast, every subgraph is
    * walked once per query in ONE pass over the index, and the global
    * per-query top-k is the PARTIAL top-k aggregate over the per-shard
    * hit streams (r20) — the rank exchange moves |q|·k rows, never the
    * `parts × k × |queries|` candidate set the former window shuffled.
    * Output: (query_id, ext_id, l2sq, rank).
    */
  def batchTopK(index: DataFrame, queries: Seq[(Long, Seq[Float])],
                k: Int, ef: Int = 64, colocated: Boolean = false,
                probeParts: Int = 0,
                centroids: Array[(Int, Array[Float])] = Array.empty)
      : DataFrame =
    batchTopKRouted(index, queries, k, ef, colocated,
      routingFor(index, queries, probeParts, centroids))

  /** [[batchTopK]] against a PRE-BUILT routing (the persisted read
    * path, where the routing has been healed against the real
    * directories — re-deriving it here from the raw centroids would
    * re-introduce the stale per-query gating the heal removed).
    */
  private[operators] def batchTopKRouted(index: DataFrame,
                                         queries: Seq[(Long, Seq[Float])],
                                         k: Int, ef: Int,
                                         colocated: Boolean,
                                         routing: Option[GraphRouting.Routing])
      : DataFrame = {
    // per-query global top-k over the per-shard hit streams via the
    // partial aggregate (r20): |q|·k rows exchanged, not |q|·p·k
    VectorSearch.topKPerGroup(
        localHits(index, queries, k, ef, colocated, routing),
        "query_id", "ext_id", "l2sq", asc = true, k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Exchange-free search over an index persisted with
    * `partitionBy("part")`: one narrow single-task scan per part
    * directory ([[PartitionedIndex.partScans]]) — the plan has NO
    * Exchange above the index scan. Falls back to the shuffled path if
    * `path` is not a part-partitioned layout.
    *
    * `probeParts > 0` routes the query to its nearest shards before any
    * scan is planned: `centroids` (e.g. the format layer's tiny `routing`
    * artifact) selects the directories, so a p-of-P probe READS p
    * directories. When `centroids` is empty they are read from the
    * index's sentinel rows instead (one pruned pass); an index with no
    * sentinels probes all shards.
    */
  def topKPersisted(spark: org.apache.spark.sql.SparkSession, path: String,
                    query: Seq[Float], k: Int, ef: Int = 64,
                    probeParts: Int = 0,
                    centroids: Array[(Int, Array[Float])] = Array.empty)
      : DataFrame = {
    val routing = persistedRouting(spark, path, Seq((0L, query)),
      probeParts, centroids, CentroidNode)
    val keep: Int => Boolean = routing.fold((_: Int) => true)(r => r.partKept)
    PartitionedIndex.partScans(spark, path, keep = keep)
      .map(scan => topKRouted(scan, query, k, ef, colocated = true, routing))
      // non-partitioned layout (or more dirs than partScans plans):
      // shuffled read. Caller centroids are not trusted against an
      // arbitrary path here, but a routing persistedRouting derived from
      // THE INDEX'S OWN sentinels is — reuse it instead of paying a
      // second full sentinel scan per call
      .getOrElse {
        val scan = spark.read.parquet(path)
        if (centroids.isEmpty && routing.isDefined)
          topKRouted(scan, query, k, ef, colocated = false, routing)
        else topK(scan, query, k, ef, probeParts = probeParts)
      }
  }

  /** Batched [[topKPersisted]]: one exchange-free pass over the UNION of
    * the batch's routed directories, each query gated inside the walk to
    * its own shard set — N queries cost one scan of ≤ |union| shards,
    * not N scans and not the full index. Falls back like the single-
    * query path (shuffled read when the layout is not part-partitioned;
    * probe-all when `probeParts = 0` or no centroids exist).
    */
  def batchTopKPersisted(spark: org.apache.spark.sql.SparkSession,
                         path: String, queries: Seq[(Long, Seq[Float])],
                         k: Int, ef: Int = 64, probeParts: Int = 0,
                         centroids: Array[(Int, Array[Float])] = Array.empty)
      : DataFrame = {
    val routing = persistedRouting(spark, path, queries, probeParts,
      centroids, CentroidNode)
    val keep: Int => Boolean = routing.fold((_: Int) => true)(r => r.partKept)
    PartitionedIndex.partScans(spark, path, keep = keep)
      // per-query gating still applies (via the routing): the union
      // scan holds shards some queries did not route to
      .map(scan => batchTopKRouted(scan, queries, k, ef,
        colocated = true, routing))
      // non-partitioned layout: shuffled read, sentinel-derived routing
      // reused (see topKPersisted)
      .getOrElse {
        val scan = spark.read.parquet(path)
        if (centroids.isEmpty && routing.isDefined)
          batchTopKRouted(scan, queries, k, ef, colocated = false, routing)
        else batchTopK(scan, queries, k, ef, probeParts = probeParts)
      }
  }

  /** Routing for a persisted read: centroids from the caller (the
    * format layer's `routing` artifact) or the index's own sentinels,
    * routes per query, then HEALED against the part directories that
    * actually exist ([[GraphRouting.heal]]) — a query whose entire
    * routed set is missing degrades to probe-all with a WARN, never to
    * an empty result, and healthy queries keep their pruning.
    */
  private[operators] def persistedRouting(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: Seq[(Long, Seq[Float])], probeParts: Int,
      centroids: Array[(Int, Array[Float])], sentinelNode: Int)
      : Option[GraphRouting.Routing] =
    GraphRouting
      .routingFor(spark.read.parquet(path), queries, probeParts,
        sentinelNode, centroids) // by-name index: scanned only if needed
      .map(r => PartitionedIndex.partIds(spark, path)
        .fold(r)(ids => GraphRouting.heal(r, ids, path)))
}
