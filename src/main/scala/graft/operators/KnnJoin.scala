package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{VectorFunctions => V}

/** DataFrame-native routed k-NN JOIN over the graph ANN families — the
  * corpus-scale generalization of the reference's batched `vector_search`
  * (muller/core/api/dataset/vector_search_ops.py:84-101): every ROW of a
  * query DataFrame finds its k nearest neighbors in the indexed corpus.
  *
  * Why it exists: [[Hnsw.batchTopK]]/[[Vamana.batchTopK]] take a
  * driver-held `Seq` and ride it through the task closure, and
  * [[GraphRouting.routesFor]] is a driver-side O(|queries|·|shards|·dim)
  * loop — the right shape for a query batch, the wrong shape for the
  * 100 TB semantic-dedup/retrieval form "every row of table A finds k
  * neighbors in table B". Here the query table NEVER touches the driver:
  *
  *   1. each query row computes its `probeParts` nearest LOGICAL CELLS
  *      distributed, via one codegen'd expression carrying the broadcast
  *      |shards| centroids ([[org.apache.spark.sql.graftnative
  *      .NearestShards]] — identical cell-grouping/tie semantics to the
  *      driver-side [[GraphRouting.route]]), and explodes to
  *      (shard, query) rows — sentinel-less shards are appended
  *      unconditionally, exactly like `Routing.allowed`;
  *   2. an equi-join on shard id (a `cogroup`) meets each shard's index
  *      rows with exactly the queries routed to it: each task
  *      reassembles its shard graph ONCE (bounded ~500 rows by the
  *      corpus-derived build sizing) and STREAMS its queries through —
  *      no cartesian, no broadcast of either table;
  *   3. the global per-query top-k is a window over |queries|·p·k
  *      candidate rows — never the corpus.
  *
  * `probeParts <= 0` (or a non-clustered index) is the probe-all
  * fallback: every query meets every shard — exact w.r.t. the per-shard
  * walks, but |queries|·|shards| exploded rows; at corpus scale always
  * pass `probeParts`. Null or wrong-dimension query vectors produce no
  * output rows (the builds drop such vectors the same way).
  *
  * Output: (query_id, ext_id, l2sq, rank), rank 1..k per query —
  * the [[Hnsw.batchTopK]] contract, and provably identical to it at
  * probe-all (KnnJoinSpec pins the parity on both families).
  */
object KnnJoin {

  private val outSchema = StructType(Seq(
    StructField("query_id", LongType),
    StructField("ext_id", LongType),
    StructField("l2sq", DoubleType)))

  /** Prune the INDEX side to the `keyCol` values SOME query routed to,
    * before the walk/join: one bounded action (distinct keys,
    * ≤ `MaxShards` rows) over the routing-only query lineage spares
    * shuffling — and, on a `partitionBy(keyCol)` layout, even READING —
    * every shard/cell no query in the batch reached. `coversAll(used)`
    * short-circuits the filter when the routed union provably spans the
    * index. The raw column (no cast) keeps the IN pushable so it
    * partition-prunes a key-partitioned read. Returns the pruned index
    * AND the used-key set (the walk partitions itself by it). The
    * caller passes a CACHED routed-query frame (r21, VERDICT r20 #1):
    * the collect here and the downstream walk/join then consume ONE
    * evaluation of the query lineage instead of two — for the
    * semantic-dedup self-join the query table is the full corpus
    * snapshot, so the second routing pass was a real constant factor
    * (and recomputation of a non-deterministic query table is unsound).
    */
  private def pruneToRouted(idx: DataFrame, keyCol: String,
                            routedQ: DataFrame,
                            coversAll: Set[Int] => Boolean)
      : (DataFrame, Set[Int]) = {
    val used = routedQ.select(col(keyCol)).distinct()
      .collect().map(_.getInt(0)).toSet
    if (used.isEmpty) (idx.filter(lit(false)), used) // no usable queries
    else if (coversAll(used)) (idx, used)
    else (idx.filter(col(keyCol).isin(used.toSeq.map(Int.box): _*)), used)
  }

  /** Bounded registry of live routed-query caches, the
    * [[GraphRouting]] assignment-cache pattern: the joins are returned
    * LAZILY, so there is no in-function unpersist point — blocks are
    * reference-tracked (ContextCleaner reclaims them with the frame)
    * and this bound keeps a long-lived session from accumulating more
    * than a few query-table caches on local disk. Eviction is
    * correctness-neutral for a DETERMINISTIC query lineage (it
    * recomputes); callers racing more than [[MaxLiveQueryCaches]]
    * unconsumed joins deep with non-deterministic query tables must
    * persist those tables themselves.
    */
  private[operators] val MaxLiveQueryCaches = 4
  private val liveQueryCaches =
    new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.rdd.RDD[_]]
  private def trackQueryCache(rdd: org.apache.spark.rdd.RDD[_]): Unit = {
    liveQueryCaches.add(rdd)
    while (liveQueryCaches.size > MaxLiveQueryCaches) {
      val old = liveQueryCaches.poll()
      if (old != null) old.unpersist(blocking = false)
    }
  }

  /** Cache a routed-query frame's planned rows once (InternalRow RDD —
    * the external-Row form measured ~45% slower on this family,
    * GraphRouting.scala:170-175) and register it in the bounded live set.
    */
  private def cacheRouted(df: DataFrame): DataFrame = {
    val (cached, rdd) =
      org.apache.spark.sql.graftnative.InternalDf.detachBatchCached(df)
    trackQueryCache(rdd)
    cached
  }

  /** k-NN join against an [[Hnsw]] index (pre-built or re-read).
    * `centroids` (e.g. the format layer's tiny `routing` artifact)
    * skips the sentinel scan; when empty they are read from the index's
    * own sentinel rows. `partsHint` (the `part=N` directory listing of a
    * persisted layout) skips the shard-enumeration scan entirely — with
    * both supplied, NO index action runs before the join itself.
    */
  def hnsw(index: DataFrame, queries: DataFrame, qIdCol: String,
           qVecCol: String, k: Int, ef: Int = 64,
           probeParts: Int = 0,
           centroids: Array[(Int, Array[Float])] = Array.empty,
           partsHint: Option[Set[Int]] = None): DataFrame = {
    val prepared = index.select(col("part").cast("int"), col("node"),
      col("ext_id"), col("vec"), col("level"), col("adj"), col("entry"))
    val kk = k
    val efC = math.max(ef, k)
    run(prepared, queries, qIdCol, qVecCol, k, probeParts,
      Hnsw.CentroidNode, centroids, partsHint,
      rows => {
        val g = Hnsw.reassemble(rows)
        (q: Array[Float]) => g.search(q, kk, efC)
      })
  }

  /** k-NN join against a [[Vamana]] (DiskANN) index: PQ/ADC walk +
    * exact re-rank per query, like [[Vamana.batchTopK]] (`rerank = 0`
    * walks on exact distances). `centroids`/`partsHint` as in [[hnsw]].
    */
  def vamana(index: DataFrame, queries: DataFrame, qIdCol: String,
             qVecCol: String, k: Int, beam: Int = 64, rerank: Int = 100,
             probeParts: Int = 0,
             centroids: Array[(Int, Array[Float])] = Array.empty,
             partsHint: Option[Set[Int]] = None): DataFrame = {
    val prepared = index.select(col("part").cast("int"), col("node"),
      col("ext_id"), col("vec"), col("code"), col("adj"), col("medoid"))
    val kk = k
    val bm = math.max(beam, k)
    val rr = rerank
    run(prepared, queries, qIdCol, qVecCol, k, probeParts,
      Vamana.CentroidNode, centroids, partsHint,
      rows => {
        val (g, codes, pqOpt) = Vamana.reassemble(rows, wantPq = rr > 0)
        (q: Array[Float]) => pqOpt match {
          case Some(pq) => g.searchPq(q, kk, bm, rr, pq, codes)
          case None => g.search(q, kk, bm)
        }
      })
  }

  /** k-NN join against an IVF index (`VectorSearch.ivfBuild`'s
    * cell-assigned table + centroids): each query row computes its
    * `nprobe` nearest cells with the same codegen'd routing expression
    * the graph join uses (every cell is its own singleton group here),
    * explodes to (cell, query) rows, and one equi-join against the
    * cell-partitioned assignments scores each surviving (row, query)
    * pair with the codegen'd metric — the DataFrame-native form of
    * [[VectorSearch.ivfBatchTopK]], whose driver-side probe-pair
    * construction is O(|queries|·nlist) and whose broadcast pairs table
    * carries every query vector; here the query table never touches the
    * driver. With `nprobe = nlist` and `exact = true` the result
    * provably equals per-query brute force (q133's oracle pins it).
    * Output: (query_id, ext_id, score, rank), best-first per query.
    */
  def ivf(assigned: DataFrame, centroids: DataFrame, vecCol: String,
          idCol: String, queries: DataFrame, qIdCol: String,
          qVecCol: String, metric: String, k: Int, nprobe: Int,
          exact: Boolean = false): DataFrame = {
    // ext_id is the long output/tie-break identity: an id column whose
    // values can fail the long cast (non-numeric strings, decimals past
    // 2^63) would silently become null ext_ids — fail loudly on any
    // type that does not PROVABLY fit (internal callers pass the long
    // _uuid/vec_id; long-safe integer decimals are accepted)
    assigned.schema(idCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType => ()
      case d: DecimalType if d.scale == 0 && d.precision <= 18 => ()
      case t => throw new IllegalArgumentException(
        s"idCol $idCol must fit a long ext_id losslessly, got $t " +
          "(join against a long surrogate id, e.g. the hidden _uuid)")
    }
    val cents = centroids.collect() // nlist rows — bounded by construction
      .map(r => (r.getAs[Int]("cell"), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    require(cents.nonEmpty, "no centroids")
    val dim = cents.head._2.length
    val flat = new Array[Float](cents.length * dim)
    cents.iterator.zipWithIndex.foreach { case ((_, c), i) =>
      System.arraycopy(c, 0, flat, i * dim, dim)
    }
    val offsets = Array.tabulate(cents.length + 1)(identity)
    val sel = graft.functions.NativeExpressions.nearestShards(
      col("_qv"), cents.length, dim, nprobe, flat, offsets,
      cents.map(_._1))
    // exact scoring runs on the int64 grid with the quantization and
    // self-norm hoisted to ONCE PER ROW on each side (O(n + |q|)
    // quantizations, one pre-quantized dot per pair) — the composite
    // cosineScaled/l2SqScaled expressions re-quantize both vectors for
    // EVERY pair (3 dots + 2 array allocs: q134's 2k-row self-join
    // measured 17 s that way). Bit-identical by construction: dotScaledQ
    // ≡ dotQL ∘ qint, the cosine's double ops are IEEE-exact on integer
    // inputs, and the l2 identity Σ(a−b)² = Σa² + Σb² − 2Σab is exact
    // integer algebra (≤ 2.6e16, well inside int64; NativeExpressionsSpec
    // pins the kernels to their HOF twins, q133/q134's oracles pin the
    // end-to-end scores).
    val exactCos = exact && metric == "cosine"
    val exactL2 = exact && metric == "l2"
    val q1 = {
      val base = queries
        .select(col(qIdCol).cast("long").as("query_id"),
          col(qVecCol).as("_qv"))
        .filter(col("_qv").isNotNull)
      if (exactCos)
        base.withColumn("_qq", V.qint(col("_qv")))
          .withColumn("_qn",
            sqrt(V.dotQ(col("_qq"), col("_qq")).cast("double")))
      else if (exactL2)
        base.withColumn("_qq", V.qint(col("_qv")))
          .withColumn("_qn2", V.dotQ(col("_qq"), col("_qq")))
      else base
    }
    // at nprobe < nlist the routed frame is consumed twice (the
    // distinct-cells collect and the join): cache its planned rows once
    val routedQ =
      if (nprobe >= cents.length) q1.withColumn("cell", explode(sel))
      else cacheRouted(q1.withColumn("cell", explode(sel)))
    // prune the assigned side to the cells SOME query probes
    // ([[pruneToRouted]]); skipped at probe-all, where every cell is
    // met by construction
    val scopedIdx =
      if (nprobe >= cents.length) assigned
      else pruneToRouted(assigned, "cell", routedQ,
        used => used.size >= cents.length)._1
    // r21: the scoring join's CPU is per (row, query) PAIR, not per
    // byte — when the planner broadcasts the (bounded) query side, the
    // probe side keeps the raw scan's split count (measured: q134's
    // whole 4.1M-pair scoring ran in TWO tasks, q133's in one), and an
    // SMJ's exchange gets AQE byte-coalesced the same way. An explicit
    // cell-keyed REPARTITION_BY_NUM (AQE-exempt) is the scoring width;
    // in the shuffle-join case it IS the join exchange (hash(cell)
    // satisfies the join's clustering), so no second corpus shuffle at
    // scale. Quantization columns are added ABOVE it so the per-row
    // qint/self-norm hoists parallelize too.
    val width = math.max(
      assigned.sparkSession.sparkContext.defaultParallelism,
      math.min(cents.length, 16384))
    val spreadIdx = scopedIdx.repartition(width, col("cell"))
    val idxSide =
      if (exactCos)
        spreadIdx.withColumn("_iq", V.qint(col(vecCol)))
          .withColumn("_in",
            sqrt(V.dotQ(col("_iq"), col("_iq")).cast("double")))
      else if (exactL2)
        spreadIdx.withColumn("_iq", V.qint(col(vecCol)))
          .withColumn("_in2", V.dotQ(col("_iq"), col("_iq")))
      else spreadIdx
    val scoreExpr =
      if (exactCos)
        try_divide(V.dotQ(col("_iq"), col("_qq")).cast("double"),
          col("_in") * col("_qn"))
      else if (exactL2)
        col("_in2") + col("_qn2") -
          lit(2L) * V.dotQ(col("_iq"), col("_qq"))
      else VectorSearch.score(metric, col(vecCol), col("_qv"), exact)
    val scored = idxSide.withColumn("cell", col("cell").cast("int"))
      .join(routedQ, "cell")
      .withColumn("_score", scoreExpr)
      .withColumn("ext_id", col(idCol).cast("long"))
      // shed the vectors at the scoring projection, then rank via the
      // PARTIAL top-k aggregate: each task reduces its pairs to ≤ k per
      // query locally, so the rank exchange carries |q|·k rows — never
      // the |q|·candidates pair set a window would shuffle whole
      .select(col("query_id"), col("ext_id"), col("_score"))
    VectorSearch.topKPerGroup(scored, "query_id", "ext_id", "_score",
        asc = metric == "l2", k)
      .select(col("query_id"), col("ext_id"), col("_score").as("score"),
        col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The shared join: `prepared` has `part` (int) first and `node`
    * second; `mkSearcher` turns one shard's rows into a per-query
    * walker. Driver state is bounded by |shards| (part ids + centroids)
    * — the query table is never collected.
    */
  private def run(prepared: DataFrame, queries: DataFrame, qIdCol: String,
                  qVecCol: String, k: Int, probeParts: Int,
                  sentinelNode: Int,
                  centroids: Array[(Int, Array[Float])],
                  partsHint: Option[Set[Int]],
                  mkSearcher: Seq[Row] => Array[Float] => Seq[(Long, Double)])
      : DataFrame = {
    val spark = prepared.sparkSession
    import spark.implicits._
    // shard enumeration, cheapest source first: a persisted layout's
    // directory listing (partsHint — zero index actions), else a
    // column-pruned part scan that never touches vec; the sentinel
    // centroids are only read at all when routing has no caller-supplied
    // centroids — then via a PUSHED node filter (persisted path) or, on
    // an unpersisted build lineage needing BOTH, one combined pass (a
    // second collect there would re-run the whole build)
    val (allParts: Array[Int], sentinelCents: Array[(Int, Array[Float])]) =
      partsHint match {
        case Some(ps) =>
          val cs =
            if (probeParts > 0 && centroids.isEmpty)
              prepared.filter(col("node") === lit(sentinelNode))
                .select(col("part"), col("vec")).collect()
                .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
            else Array.empty[(Int, Array[Float])]
          (ps.toArray.sorted, cs)
        case None if probeParts <= 0 || centroids.nonEmpty =>
          (prepared.select(col("part")).distinct().collect()
             .map(_.getInt(0)).sorted,
           Array.empty[(Int, Array[Float])])
        case None =>
          val info = prepared.groupBy(col("part"))
            .agg(max(when(col("node") === lit(sentinelNode), col("vec")))
              .as("cent"))
            .collect()
            .map(r => (r.getInt(0), Option(r.get(1)).map(_ =>
              r.getSeq[Float](1).toArray)))
          (info.map(_._1).sorted,
           info.collect { case (p, Some(c)) => (p, c) })
      }
    val rawCents =
      if (probeParts <= 0) Array.empty[(Int, Array[Float])]
      else if (centroids.nonEmpty) centroids
      else sentinelCents
    // caller-supplied centroids can be staler than the frame (a routing
    // artifact surviving a crash-interrupted rewrite): a shard id the
    // frame does not hold can never be met by the cogroup, so a query
    // routed only to such ids would silently return nothing — re-route
    // every query against the surviving cells instead (the frame's own
    // shard list is ground truth here), probe-all when none survive
    val allSet = allParts.toSet
    val cents = rawCents.filter(c => allSet.contains(c._1))
    if (cents.length < rawCents.length)
      System.err.println("graft: WARN knn-join routing centroids name " +
        s"${rawCents.length - cents.length} shard(s) absent from the " +
        "index (stale routing artifact?); " +
        (if (cents.isEmpty) "probing all shards"
         else "re-routing against the surviving cells"))
    // null ELEMENTS are dropped like null/wrong-dim vectors (the routing
    // expression and the shard walk would otherwise read the null slot
    // as 0 and return plausible garbage) — same contract on the
    // probe-all path, which never runs the routing expression
    val q0 = queries.select(col(qIdCol).cast("long").as("query_id"),
        col(qVecCol).as("_qv"))
      .filter(col("_qv").isNotNull)
      .filter(!exists(col("_qv"), e => e.isNull))
    val routedQ =
      if (cents.isEmpty)
        q0.withColumn("part", explode(typedlit(allParts.toSeq)))
      else {
        val dim = cents.head._2.length
        // group sub-shards by identical centroid (one logical cell per
        // skew split), ordered by min shard id — route()'s tie order
        val groups = cents.groupBy(_._2.toSeq).values.toArray
          .map(g => (g.map(_._1).min, g.map(_._1).sorted, g.head._2))
          .sortBy(_._1)
        val flat = new Array[Float](groups.length * dim)
        groups.iterator.zipWithIndex.foreach { case ((_, _, c), i) =>
          System.arraycopy(c, 0, flat, i * dim, dim)
        }
        val offsets = groups.scanLeft(0)((acc, g) => acc + g._2.length)
        val shardsFlat = groups.flatMap(_._2)
        val routedSet = cents.map(_._1).toSet
        val unrouted = allParts.filterNot(routedSet) // ALWAYS probed
        val sel = graft.functions.NativeExpressions.nearestShards(
          col("_qv"), groups.length, dim, probeParts, flat,
          offsets, shardsFlat)
        val withUnrouted =
          if (unrouted.isEmpty) sel
          else concat(sel, typedlit(unrouted.toSeq))
        q0.withColumn("part", explode(withUnrouted))
      }
    // prune to the routed-part union ([[pruneToRouted]]); skipped at
    // probe-all, where every shard is met by construction and the extra
    // query-table pass buys nothing. The routed path caches the routed
    // frame's planned rows FIRST, so the prune collect and the walk
    // consume one evaluation of the query lineage (VERDICT r20 #1).
    val (scopedIdx, walkQ, walkParts) =
      if (cents.isEmpty) (prepared, routedQ, allParts.toSet)
      else {
        val cached = cacheRouted(routedQ)
        val (p, used) = pruneToRouted(prepared, "part", cached,
          used => allParts.forall(used))
        (p, cached, used)
      }
    // THE WALK (r21). The cogroup this replaces hash-partitioned both
    // sides by the group key through an ENSURE_REQUIREMENTS exchange
    // that AQE coalesces BY BYTE SIZE — and a shard walk's cost is CPU
    // per routed query, not bytes, so at suite scale every shard's
    // walks collapsed into ONE task (measured: q132's two walk stages
    // ran 3.0 s + 1.7 s single-task, the query's whole budget). An RDD
    // repartitionAndSortWithinPartitions with an EXACT part→partition
    // placement (one walk task per routed shard — no hash collisions,
    // no byte-based coalescing; |usedParts| ≤ MaxShards bounds the
    // partition count) keys rows (part, tag) with index rows sorting
    // BEFORE query rows, so each task buffers one shard's rows
    // (bounded by build sizing, the cogroup's own memory contract),
    // reassembles the graph once, and STREAMS its queries through.
    val hits = walk(spark, scopedIdx, walkQ, walkParts, mkSearcher)
    // per-query global top-k over the per-shard k-hit streams, via the
    // partial aggregate: |q|·k exchanged, not |q|·p·k
    VectorSearch.topKPerGroup(hits, "query_id", "ext_id", "l2sq",
        asc = true, k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** The walk as one Tungsten-native plan: tag and union both sides,
    * hash-exchange on `part` with an EXPLICIT width (REPARTITION_BY_NUM
    * — AQE's byte-sized coalescing keeps its hands off it, and walk
    * cost is CPU per routed query, not bytes), sort (part, tag) within
    * partitions so each shard's index rows arrive BEFORE its queries,
    * and stream one typed mapPartitions over the sorted run: buffer one
    * shard (bounded by build sizing — the cogroup's own memory
    * contract), reassemble its graph once, stream its queries through.
    * A first cut shuffled external Rows through an RDD
    * repartitionAndSortWithinPartitions: exact placement, but the
    * external-Row/Java-serializer boundary DOUBLED walk CPU (measured
    * 4.4 → 8.6 s on q132) — this form keeps UnsafeRows end-to-end and
    * converts once, after the exchange. Returns (query_id, ext_id,
    * l2sq) rows. */
  private[operators] def walk(spark: org.apache.spark.sql.SparkSession,
                              scopedIdx: DataFrame, routedQ: DataFrame,
                              parts: Set[Int],
                              mkSearcher: Seq[Row] => Array[Float] =>
                                Seq[(Long, Double)]): DataFrame = {
    val idxCols = scopedIdx.columns
    val idxStructT = StructType(scopedIdx.schema.fields)
    // width: every core busy even at few shards (hash spreads |parts|
    // keys over n buckets; a rare collision serializes 2 shards in one
    // task, never all of them in one), one-to-few shards per task at
    // cluster scale, capped so a MaxShards index cannot explode the
    // task count
    val n = math.max(spark.sparkContext.defaultParallelism,
      math.min(4 * math.max(parts.size, 1), 16384))
    lastWalkParallelism.set(n)
    val idxTagged = scopedIdx.select(
      col(idxCols.head).cast("int").as("_p"), // part — first by contract
      lit(0).as("_t"),
      lit(null).cast("bigint").as("_qid"),
      lit(null).cast(ArrayType(FloatType)).as("_wqv"),
      struct(idxCols.map(col).toIndexedSeq: _*).as("_i"))
    val qTagged = routedQ.select(
      col("part").cast("int").as("_p"),
      lit(1).as("_t"),
      col("query_id").as("_qid"),
      col("_qv").as("_wqv"),
      lit(null).cast(idxStructT).as("_i"))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    idxTagged.unionByName(qTagged)
      .repartition(n, col("_p"))
      .sortWithinPartitions(col("_p"), col("_t"))
      .mapPartitions { it =>
        new Iterator[Row] {
          private var curPart = Int.MinValue
          private var buf = Vector.newBuilder[Row]
          private var built = false // searcher resolved for curPart
          private var searcher: Array[Float] => Seq[(Long, Double)] = null
          private var dim = -1
          private var out: Iterator[Row] = Iterator.empty
          private def ensureSearcher(): Unit = if (!built) {
            built = true
            val rows = buf.result()
            buf = null // one shard's rows live only until the build
            dim = rows.collectFirst {
              case r if r.getInt(1) >= 0 => r.getSeq[Float](3).length
            }.getOrElse(-1)
            // a part with no real nodes walks nowhere (searcher stays
            // null); ditto a part whose queries arrived with no index
            // rows at all
            searcher = if (dim < 0) null else mkSearcher(rows)
          }
          @annotation.tailrec private def advance(): Unit =
            if (!out.hasNext && it.hasNext) {
              val row = it.next()
              val part = row.getInt(0)
              if (part != curPart) { // new shard group
                curPart = part; buf = Vector.newBuilder[Row]
                built = false; searcher = null; dim = -1
              }
              if (row.getInt(1) == 0) buf += row.getStruct(4)
              else {
                ensureSearcher()
                if (searcher != null) {
                  val qv = row.getSeq[Float](3).toArray
                  // wrong-dim queries walk nowhere (a prefix distance
                  // would return plausible garbage)
                  if (qv.length == dim) {
                    val qid = row.getLong(2)
                    out = searcher(qv).iterator
                      .map { case (id, d) => Row(qid, id, d) }
                  }
                }
              }
              advance()
            }
          override def hasNext: Boolean = { advance(); out.hasNext }
          override def next(): Row = { advance(); out.next() }
        }
      }
  }

  /** Test instrumentation (the [[graft.format.CommitLog.commitReads]]
    * pattern): the exchange width the last walk placed — specs assert
    * it spreads the shard walks, the invariant the cogroup's byte-sized
    * AQE coalescing broke (measured: every shard's walks in ONE task). */
  private[operators] val lastWalkParallelism =
    new java.util.concurrent.atomic.AtomicInteger(-1)
}
