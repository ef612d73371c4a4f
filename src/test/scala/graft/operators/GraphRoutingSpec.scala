package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shard routing for the graph ANN families (VERDICT r17 #2): clustered
  * builds persist per-shard centroids, routed search probes only the
  * query's nearest p shards, and the persisted read path prunes whole
  * part directories. Probe-all stays the default and the exactness
  * fallback; shards without a centroid are always probed.
  */
class GraphRoutingSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val clusters = 8
  private val perCluster = 60

  /** Deterministic clustered corpus: `clusters` well-separated Gaussian-ish
    * blobs on distinct axes (offset 10·c on axis c % dim), jitter from a
    * hash so rebuilds are identical.
    */
  private lazy val corpus: DataFrame = {
    val rows = for {
      c <- 0 until clusters
      i <- 0 until perCluster
    } yield {
      val id = (c * perCluster + i).toLong
      val v = Array.tabulate(dim) { d =>
        val base = if (d == c % dim) 10.0f * (c + 1) else 0.0f
        val h = scala.util.hashing.MurmurHash3.productHash((c, i, d))
        base + (h % 1000) / 2000.0f
      }
      (id, v.toSeq)
    }
    rows.toDF("vec_id", "emb")
  }

  /** A query near cluster `c`'s center. */
  private def queryFor(c: Int): Seq[Float] =
    Array.tabulate(dim)(d => if (d == c % dim) 10.0f * (c + 1) else 0.0f).toSeq

  private def exactTopK(q: Seq[Float], k: Int): Seq[Long] = {
    val qa = q.toArray
    corpus.collect().map { r =>
      val v = r.getSeq[Float](1)
      var s = 0.0; var i = 0
      while (i < dim) { val d = v(i) - qa(i); s += d * d; i += 1 }
      (s, r.getLong(0))
    }.sortBy(identity).take(k).map(_._2).toSeq
  }

  test("clustered build emits one centroid sentinel per non-empty shard") {
    val idx = Hnsw.build(corpus, "emb", "vec_id", numPartitions = clusters,
      clustered = true)
    val sentinels = idx.filter(col("node") === Hnsw.CentroidNode)
      .select("part", "ext_id").collect()
    val parts = idx.filter(col("node") >= 0)
      .select("part").distinct().as[Int].collect().toSet
    assert(sentinels.map(_.getInt(0)).toSet === parts,
      "every shard with graph rows must carry exactly its centroid sentinel")
    assert(sentinels.length === parts.size)
    // ext_id of the sentinel records the shard's node count
    val counts = idx.filter(col("node") >= 0).groupBy("part").count()
      .as[(Int, Long)].collect().toMap
    sentinels.foreach(s =>
      assert(s.getLong(1) === counts(s.getInt(0))))
  }

  test("vamana clustered build keeps PQ and centroid sentinels distinct") {
    val idx = Vamana.build(corpus, "emb", "vec_id", numPartitions = clusters,
      pqM = 4, pqK = 8, clustered = true)
    val byKind = idx.filter(col("node") < 0)
      .groupBy("node").count().as[(Int, Long)].collect().toMap
    assert(byKind.keySet === Set(Vamana.PqNode, Vamana.CentroidNode))
    assert(byKind(Vamana.PqNode) === byKind(Vamana.CentroidNode),
      "one PQ codebook and one centroid per shard")
  }

  test("routing to all shards equals probe-all exactly (both families)") {
    val hIdx = Hnsw.build(corpus, "emb", "vec_id", numPartitions = clusters,
      clustered = true)
    val vIdx = Vamana.build(corpus, "emb", "vec_id",
      numPartitions = clusters, pqM = 4, pqK = 8, clustered = true)
    val q = queryFor(3)
    val nShards = hIdx.filter(col("node") === Hnsw.CentroidNode).count().toInt
    val hAll = Hnsw.topK(hIdx, q, 10, colocated = true).collect().toSeq
    val hRouted = Hnsw.topK(hIdx, q, 10, colocated = true,
      probeParts = nShards).collect().toSeq
    assert(hRouted === hAll)
    val vAll = Vamana.topK(vIdx, q, 10, colocated = true).collect().toSeq
    val vRouted = Vamana.topK(vIdx, q, 10, colocated = true,
      probeParts = nShards).collect().toSeq
    assert(vRouted === vAll)
  }

  test("routed search at small p keeps recall on clustered data") {
    val hIdx = Hnsw.build(corpus, "emb", "vec_id", numPartitions = clusters,
      clustered = true)
    val vIdx = Vamana.build(corpus, "emb", "vec_id",
      numPartitions = clusters, pqM = 4, pqK = 8, clustered = true)
    (0 until clusters).foreach { c =>
      val q = queryFor(c)
      val truth = exactTopK(q, 10).toSet
      val h = Hnsw.topK(hIdx, q, 10, colocated = true, probeParts = 2)
        .select("ext_id").as[Long].collect().toSet
      val v = Vamana.topK(vIdx, q, 10, colocated = true, probeParts = 2)
        .select("ext_id").as[Long].collect().toSet
      assert((h intersect truth).size >= 8,
        s"hnsw p=2 recall collapsed for cluster $c: ${(h intersect truth).size}/10")
      assert((v intersect truth).size >= 8,
        s"vamana p=2 recall collapsed for cluster $c: ${(v intersect truth).size}/10")
    }
  }

  test("probeParts on a non-clustered index falls back to probe-all") {
    val idx = Hnsw.build(corpus, "emb", "vec_id", numPartitions = 4)
    assert(idx.filter(col("node") < 0).count() === 0L)
    val q = queryFor(1)
    val all = Hnsw.topK(idx, q, 10, colocated = true).collect().toSeq
    val routed = Hnsw.topK(idx, q, 10, colocated = true, probeParts = 1)
      .collect().toSeq
    assert(routed === all)
  }

  test("shards without a centroid are always probed (append safety)") {
    // clustered base index, then graft on an UN-routed shard holding the
    // true nearest neighbor of a far-away query: p=1 routing must still
    // find it, because unrouted shards sit outside routedParts
    val base = Hnsw.build(corpus, "emb", "vec_id",
      numPartitions = clusters, clustered = true)
    val farQ = Array.fill(dim)(500.0f).toSeq
    val extraShard = base.agg(max("part")).head().getInt(0) + 1
    val extra = Hnsw.build(
        Seq((999000L, farQ)).toDF("vec_id", "emb"), "emb", "vec_id",
        numPartitions = 1)
      .withColumn("part", lit(extraShard))
    val idx = base.unionByName(extra)
    val hit = Hnsw.topK(idx, farQ, 1, colocated = true, probeParts = 1)
      .select("ext_id").as[Long].collect()
    assert(hit.toSeq === Seq(999000L),
      "routing pruned a shard it had never seen a centroid for")
  }

  test("persisted routed read prunes part directories (both families)") {
    val hPath = tmpDir("hnsw_routed") + "/idx"
    val vPath = tmpDir("vamana_routed") + "/idx"
    Hnsw.build(corpus, "emb", "vec_id", numPartitions = clusters,
        clustered = true)
      .write.partitionBy("part").parquet(hPath)
    Vamana.build(corpus, "emb", "vec_id", numPartitions = clusters,
        pqM = 4, pqK = 8, clustered = true)
      .write.partitionBy("part").parquet(vPath)
    val q = queryFor(2)
    val truth = exactTopK(q, 10).toSet

    val hRouted = Hnsw.topKPersisted(spark, hPath, q, 10, probeParts = 2)
    val hDirs = hRouted.inputFiles
      .flatMap(f => "part=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt))
      .distinct
    assert(hDirs.length === 2,
      s"p=2 probe must read 2 part directories, read ${hDirs.toSeq}")
    val hHits = hRouted.select("ext_id").as[Long].collect().toSet
    assert((hHits intersect truth).size >= 8)

    val vRouted = Vamana.topKPersisted(spark, vPath, q, 10, probeParts = 2)
    val vDirs = vRouted.inputFiles
      .flatMap(f => "part=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt))
      .distinct
    assert(vDirs.length === 2,
      s"p=2 probe must read 2 part directories, read ${vDirs.toSeq}")
    val vHits = vRouted.select("ext_id").as[Long].collect().toSet
    assert((vHits intersect truth).size >= 8)
  }

  test("persisted BATCH routed read scans only the union of routed dirs") {
    val hPath = tmpDir("hnsw_batch_routed") + "/idx"
    Hnsw.build(corpus, "emb", "vec_id", numPartitions = clusters,
        clustered = true)
      .write.partitionBy("part").parquet(hPath)
    val vPath = tmpDir("vamana_batch_routed") + "/idx"
    Vamana.build(corpus, "emb", "vec_id", numPartitions = clusters,
        pqM = 4, pqK = 8, clustered = true)
      .write.partitionBy("part").parquet(vPath)
    val queries = Seq(10L -> queryFor(1), 60L -> queryFor(6))
    def dirsOf(df: org.apache.spark.sql.DataFrame): Set[Int] =
      df.inputFiles.flatMap(f =>
        "part=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt)).toSet
    for ((path, routed) <- Seq(
        hPath -> Hnsw.batchTopKPersisted(spark, hPath, queries, k = 10,
          probeParts = 2),
        vPath -> Vamana.batchTopKPersisted(spark, vPath, queries, k = 10,
          probeParts = 2))) {
      // two far-apart queries at p=2: the union is ≤ 4 directories of 8
      val dirs = dirsOf(routed)
      assert(dirs.size <= 4 && dirs.nonEmpty,
        s"$path: union scan read ${dirs.toSeq.sorted}")
      // each query's hits still reach its own cluster's true neighbors
      val got = routed.select("query_id", "ext_id")
        .as[(Long, Long)].collect().groupBy(_._1).view
        .mapValues(_.map(_._2).toSet).toMap
      queries.foreach { case (qid, q) =>
        val truth = exactTopK(q, 10).toSet
        assert((got(qid) intersect truth).size >= 8,
          s"$path: batch persisted routed recall collapsed for $qid")
      }
    }
  }

  test("stale routing centroids self-heal to probe-all, never empty") {
    // a routing artifact that diverged from the graph (crash between the
    // graph overwrite and the artifact rewrite) can route a query to
    // shard ids that no longer exist; the persisted searchers must fall
    // back to probing every REAL directory instead of silently returning
    // an empty result
    val path = tmpDir("stale_routing") + "/idx"
    Hnsw.build(corpus, "emb", "vec_id", numPartitions = clusters,
        clustered = true)
      .write.partitionBy("part").parquet(path)
    val q = queryFor(3)
    val truth = exactTopK(q, 10).toSet
    // stale artifact: it CLAIMS every real shard id (so none counts as
    // unrouted) but places their centroids far away, and routes the
    // query to shard 999 — which no longer exists on disk. keep() then
    // drops every real directory: the empty-result shape
    val realIds = spark.read.parquet(path)
      .select("part").distinct().as[Int].collect()
    val far = Array.fill(dim)(-1000.0f)
    val bogus = realIds.map(id => (id, far)) :+ (999, q.toArray)
    val healed = Hnsw.topKPersisted(spark, path, q, 10, probeParts = 1,
      centroids = bogus)
    val hits = healed.select("ext_id").as[Long].collect().toSet
    assert(hits.nonEmpty, "stale routing must not produce an empty result")
    assert((hits intersect truth).size >= 8, "self-heal must probe all")
    val batchHealed = Hnsw.batchTopKPersisted(spark, path,
      Seq(7L -> q), 10, probeParts = 1, centroids = bogus)
    val bHits = batchHealed.select("ext_id").as[Long].collect().toSet
    assert((bHits intersect truth).size >= 8)
  }

  test("default shard count tracks corpus rows, not cores (r19)") {
    // the formula: ~500-row shards, clamped to [1, 4096]
    assert(GraphRouting.shardsFor(0) === 1)
    assert(GraphRouting.shardsFor(480) === 1)
    assert(GraphRouting.shardsFor(501) === 2)
    assert(GraphRouting.shardsFor(1300) === 3)
    assert(GraphRouting.shardsFor(100000) === 200)
    assert(GraphRouting.shardsFor(100L * 1000 * 1000 * 1000) === 4096)
    // a default build derives its shard count from the row count — it
    // must NOT scale with defaultParallelism (4 in this suite): 1300
    // rows → 3 shards, and per-shard build memory stays ~500 rows no
    // matter how many cores the cluster has
    val rows = (0 until 1300).map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        (i % 13) * 3.0f + d + (i % 7) / 10.0f).toSeq)
    }
    val df = rows.toDF("vec_id", "emb")
    for (idx <- Seq(
        Hnsw.build(df, "emb", "vec_id", clustered = true),
        Vamana.build(df, "emb", "vec_id", pqM = 4, pqK = 8,
          clustered = true))) {
      val parts = idx.filter(col("node") >= 0)
        .select("part").distinct().count().toInt
      assert(parts >= 1 && parts <= 3,
        s"default build must derive ~n/500 shards (got $parts for 1300 " +
          s"rows on ${spark.sparkContext.defaultParallelism} cores)")
    }
  }

  test("oversized k-means cell splits into capped sub-shards (skew)") {
    // 1500 near-identical rows (one dominant cell) + 100 spread rows:
    // without the cap one build task holds a 1500-node graph; with it
    // the dominant cell splits into ~avg-sized sub-shards sharing its
    // centroid, so no shard exceeds 2× the average
    // IDENTICAL vectors: the duplicate-heavy-corpus case — k-means puts
    // every copy in one cell no matter how many seeds land on it
    val blob = (0 until 1500).map { i =>
      (i.toLong, Array.tabulate(dim)(d => 0.25f + d * 0.01f).toSeq)
    }
    val spread = (0 until 100).map { i =>
      (10000L + i, Array.tabulate(dim)(d =>
        100.0f + (if (d == i % dim) i.toFloat else 0.0f)).toSeq)
    }
    val df = (blob ++ spread).toDF("vec_id", "emb")
    val parts = 4
    // the cap: 2x the average shard, floored at 2x the 500-row target
    val cap = math.max(2L * (1600L / parts), 1000L)
    val idx = Hnsw.build(df, "emb", "vec_id", numPartitions = parts,
      clustered = true)
    val perShard = idx.filter(col("node") >= 0)
      .groupBy("part").count().as[(Int, Long)].collect().toMap
    assert(perShard.values.max <= cap,
      s"a shard exceeds the skew cap: $perShard")
    // every non-empty shard still carries exactly one centroid sentinel,
    // and the split's sub-shards SHARE their parent cell's centroid —
    // fewer distinct centroid values than shards proves a split happened
    val sentinels = idx.filter(col("node") === Hnsw.CentroidNode)
      .select("part", "vec").as[(Int, Seq[Float])].collect()
    assert(sentinels.map(_._1).toSet === perShard.keySet)
    assert(sentinels.map(_._2).distinct.length < sentinels.length,
      "the dominant cell must have split into centroid-sharing sub-shards")
    // search semantics preserved: every duplicate ties on distance, so
    // exact-id recall is meaningless — assert the search lands IN the
    // blob (ids < 1500), probe-all and routed alike. p counts LOGICAL
    // cells: p=1 at the blob probes ALL its sub-shards (they share the
    // centroid) — a hash-arbitrary 1-of-4 fraction would still pass
    // here, so the spread query below pins the cell-counting semantics
    val blobQ = Array.tabulate(dim)(d => 0.25f + d * 0.01f).toSeq
    val all = Hnsw.topK(idx, blobQ, 10, colocated = true)
      .select("ext_id").as[Long].collect().toSet
    assert(all.size === 10 && all.forall(_ < 1500L))
    val routed = Hnsw.topK(idx, blobQ, 10, colocated = true,
      probeParts = 1)
      .select("ext_id").as[Long].collect().toSet
    assert(routed.size === 10 && routed.forall(_ < 1500L),
      "routing into the split sub-shards lost the blob neighborhood")
    // a spread query at p=1 must reach its own (unsplit) cell even
    // though the split flooded the id space with blob sub-shards
    val spreadQ = spread.head._2
    val sRouted = Hnsw.topK(idx, spreadQ, 5, colocated = true,
      probeParts = 1)
      .select("ext_id").as[Long].collect().toSet
    assert(sRouted.nonEmpty && sRouted.forall(_ >= 10000L),
      s"spread query routed into the blob: $sRouted")
  }

  test("heal marks only fully-stale queries probe-all") {
    val r = GraphRouting.Routing(
      Map(1L -> Set(0, 9), 2L -> Set(8, 9)), Set(0, 1, 8, 9))
    val healed = GraphRouting.heal(r, existing = Set(0, 1, 2), "t")
    // query 1 still reaches shard 0 — untouched, keeps its pruning
    assert(healed.queryParts(1L) === Set(0, 9))
    // query 2's whole set is gone — probe-all over the real directories
    assert(healed.queryParts(2L) === Set(0, 1, 2))
    assert(healed.routedParts === r.routedParts)
  }

  test("batch: a query routed only to missing dirs heals, others prune") {
    // the ADVICE r18 case: PARTIAL staleness — one query's entire routed
    // set maps to directories that no longer exist while another query's
    // routing is healthy. The stale query must NOT silently return zero
    // rows: it degrades to probe-all; the healthy query keeps pruning.
    val path = tmpDir("partial_stale") + "/idx"
    Hnsw.build(corpus, "emb", "vec_id", numPartitions = clusters,
        clustered = true)
      .write.partitionBy("part").parquet(path)
    val real = GraphRouting.centroidsOf(
      spark.read.parquet(path), Hnsw.CentroidNode)
    val farQ = Array.fill(dim)(999.0f).toSeq
    // two bogus shards sit exactly at farQ: at p=2 the victim query
    // routes ONLY to them (both missing on disk); the healthy query's
    // nearest centroids are all real
    val bogus = real ++ Array(998 -> farQ.toArray, 999 -> farQ.toArray)
    val healthyQ = queryFor(2)
    val out = Hnsw.batchTopKPersisted(spark, path,
        Seq(1L -> healthyQ, 2L -> farQ), k = 10, probeParts = 2,
        centroids = bogus)
      .select("query_id", "ext_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(out.contains(2L) && out(2L).nonEmpty,
      "fully-stale query silently returned zero rows")
    assert((out(2L) intersect exactTopK(farQ, 10).toSet).size >= 8,
      "healed query must probe all real shards")
    assert((out(1L) intersect exactTopK(healthyQ, 10).toSet).size >= 8,
      "healthy query's routing broke under a batch-mate's heal")
  }

  test("capped assignment materializes the argmin once, exactly") {
    // ADVICE r19 #4: the cap's counting pass and the downstream build
    // both consume the corpus-wide argmin; without materialization each
    // re-runs it from the scan. The counts must be EXACT, not estimated
    // from the refine pass — one Lloyd mean-update can move a
    // duplicate-heavy cell wholesale across an exact-centroid tie (this
    // corpus does exactly that when seeds land on blob duplicates), so
    // pre-update statistics misplace the very cell the cap exists for.
    val blob = (0 until 1500).map { i =>
      (i.toLong, Array.tabulate(dim)(d => 0.25f + d * 0.01f).toSeq)
    }
    val spread = (0 until 100).map { i =>
      (10000L + i, Array.tabulate(dim)(d =>
        100.0f + (if (d == i % dim) i.toFloat else 0.0f)).toSeq)
    }
    val df = (blob ++ spread).toDF("vec_id", "emb")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (assigned, cents) =
      GraphRouting.assignShardsCapped(df, "emb", "vec_id", 4)
    // the assignment RDD was persisted (reference-tracked — ContextCleaner
    // reclaims it with the index; no Dataset-level CacheManager entry)
    val cached = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
    try {
      assert(cents.length > 4, "the dominant cell must have split")
      assert(cached.nonEmpty, "capped assignment must persist the argmin")
      assert(cached.values.exists(_.getStorageLevel ==
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      // consumers of the returned frame read materialized cells — the plan
      // carries no argmin expression to re-run per consumer
      val plan = assigned.queryExecution.optimizedPlan.toString
      assert(!plan.contains("graft_nearest_cell"),
        s"capped assignment consumers must not re-run the argmin:\n$plan")
      // and the materialized assignment is the REAL one: cap holds on the
      // actual shard sizes, blob and spread land apart
      val perShard = assigned.filter(col("cell").isNotNull)
        .groupBy("cell").count().as[(Int, Long)].collect().toMap
      val cap = math.max(2L * (1600L / 4), 1000L)
      assert(perShard.values.max <= cap,
        s"a shard exceeds the skew cap: $perShard")
    } finally cached.values.foreach(_.unpersist(blocking = false))
  }

  test("assignment caches are bounded across repeated capped builds") {
    // a build's cache has no deterministic unpersist point (the builders
    // return lazy frames), so repeated builds must evict beyond the ring
    // bound instead of accumulating one corpus-sized cache per build
    val df = (0 until 1200).map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        (i % 3) * 30.0f + (if (d == i % dim) 1.0f else 0.0f)).toSeq)
    }.toDF("vec_id", "emb")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    (0 until GraphRouting.MaxLiveAssignmentCaches + 3).foreach { _ =>
      GraphRouting.assignShardsCapped(df, "emb", "vec_id", 3); ()
    }
    val live = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
    try assert(live.size <= GraphRouting.MaxLiveAssignmentCaches,
      s"capped builds leaked ${live.size} assignment caches " +
        s"(bound ${GraphRouting.MaxLiveAssignmentCaches})")
    finally live.values.foreach(_.unpersist(blocking = false))
  }

  test("skew cap holds with refineIters = 0 (unrefined seed centroids)") {
    val blob = (0 until 1500).map { i =>
      (i.toLong, Array.tabulate(dim)(d => 0.25f + d * 0.01f).toSeq)
    }
    val spread = (0 until 100).map { i =>
      (10000L + i, Array.tabulate(dim)(d =>
        100.0f + (if (d == i % dim) i.toFloat else 0.0f)).toSeq)
    }
    val df = (blob ++ spread).toDF("vec_id", "emb")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (assigned, cents) =
      GraphRouting.assignShardsCapped(df, "emb", "vec_id", 4,
        refineIters = 0)
    try {
      assert(cents.length > 4, "split must fire on the skewed corpus")
      val cap = math.max(2L * (1600L / 4), 1000L)
      val perShard = assigned.filter(col("cell").isNotNull)
        .groupBy("cell").count().as[(Int, Long)].collect().toMap
      assert(perShard.values.max <= cap,
        s"a shard exceeds the skew cap: $perShard")
    } finally spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
      .values.foreach(_.unpersist(blocking = false))
  }

  test("batch routing gates each query to its own shards") {
    val idx = Hnsw.build(corpus, "emb", "vec_id", numPartitions = clusters,
      clustered = true)
    val queries = Seq(0L -> queryFor(0), 5L -> queryFor(5))
    val routed = Hnsw.batchTopK(idx, queries, k = 10, colocated = true,
      probeParts = 2)
    val got = routed.select("query_id", "ext_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    queries.foreach { case (qid, q) =>
      val truth = exactTopK(q, 10).toSet
      assert((got(qid) intersect truth).size >= 8,
        s"batch routed recall collapsed for query $qid")
    }
  }
}
