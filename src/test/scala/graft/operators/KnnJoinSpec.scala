package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame-native routed k-NN join (VERDICT r18 #2): queries as a
  * DataFrame, distributed shard routing, cogroup equi-join on shard id —
  * no driver collect of the query table, no cartesian.
  */
class KnnJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val clusters = 8
  private val perCluster = 60

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

  private def qdf(cs: Seq[Int]): DataFrame =
    cs.map(c => (c.toLong, queryFor(c))).toDF("qid", "qv")

  test("probe-all knn join is row-identical to batchTopK (both families)") {
    val hIdx = Hnsw.build(corpus, "emb", "vec_id", numPartitions = clusters,
      clustered = true)
    val vIdx = Vamana.build(corpus, "emb", "vec_id",
      numPartitions = clusters, pqM = 4, pqK = 8, clustered = true)
    val cs = Seq(0, 3, 6)
    val queries = cs.map(c => (c.toLong, queryFor(c)))
    val hJoin = KnnJoin.hnsw(hIdx, qdf(cs), "qid", "qv", k = 10)
      .collect().toSeq
    val hBatch = Hnsw.batchTopK(hIdx, queries, k = 10, colocated = true)
      .collect().toSeq
    assert(hJoin === hBatch)
    val vJoin = KnnJoin.vamana(vIdx, qdf(cs), "qid", "qv", k = 10,
      rerank = 64).collect().toSeq
    val vBatch = Vamana.batchTopK(vIdx, queries, k = 10, rerank = 64,
      colocated = true).collect().toSeq
    assert(vJoin === vBatch)
  }

  test("routed knn join keeps per-query recall at small p") {
    val hIdx = Hnsw.build(corpus, "emb", "vec_id", numPartitions = clusters,
      clustered = true)
    val vIdx = Vamana.build(corpus, "emb", "vec_id",
      numPartitions = clusters, pqM = 4, pqK = 8, clustered = true)
    val cs = 0 until clusters
    val h = KnnJoin.hnsw(hIdx, qdf(cs), "qid", "qv", k = 10,
        probeParts = 2)
      .select("query_id", "ext_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val v = KnnJoin.vamana(vIdx, qdf(cs), "qid", "qv", k = 10,
        rerank = 64, probeParts = 2)
      .select("query_id", "ext_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    cs.foreach { c =>
      val truth = exactTopK(queryFor(c), 10).toSet
      assert((h(c.toLong) intersect truth).size >= 8,
        s"hnsw knn-join p=2 recall collapsed for cluster $c")
      assert((v(c.toLong) intersect truth).size >= 8,
        s"vamana knn-join p=2 recall collapsed for cluster $c")
    }
  }

  test("plan: no cartesian product, one walk task per routed shard") {
    val idx = Hnsw.build(corpus, "emb", "vec_id", numPartitions = clusters,
      clustered = true)
    val joined = KnnJoin.hnsw(idx, qdf(Seq(1, 5)), "qid", "qv", k = 5,
      probeParts = 2)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"knn join planned a cartesian:\n$plan")
    // r21: the walk is a tagged-union exchange with an EXPLICIT width
    // (REPARTITION_BY_NUM — exempt from AQE's byte-sized coalescing,
    // which had collapsed every shard's walks into ONE task; walk cost
    // is CPU per routed query, not bytes) sorted (part, tag) into one
    // MapPartitions searcher
    assert(plan.contains("MapPartitions"),
      s"knn join walk must be the sorted-union MapPartitions stage:\n$plan")
    assert(KnnJoin.lastWalkParallelism.get >=
      spark.sparkContext.defaultParallelism,
      s"walk width ${KnnJoin.lastWalkParallelism.get} was coalesced")
    // the walk exchange must be the explicit-width form (AQE leaves
    // REPARTITION_BY_NUM alone); the routed-query frame itself is
    // cached once (VERDICT r20 #1) so its routing lineage detaches
    // into a LogicalRDD — the no-driver-collect property is structural
    // (pruneToRouted collects only the bounded distinct-parts set)
    assert(plan.contains("REPARTITION_BY_NUM"),
      s"walk exchange lost its explicit width:\n$plan")
    // r20: the per-query rank is the PARTIAL top-k aggregate (map-side
    // combine: |q|·k rows exchanged), never a window over every hit
    assert(!plan.contains("Window"),
      s"knn join must rank via the partial aggregate, not a window:\n$plan")
    assert(plan.contains("graft_top_k_pairs") &&
      plan.contains("partial_graft_top_k_pairs"),
      s"knn join rank must be the partial top-k aggregate:\n$plan")
  }

  test("sentinel-less shards are always probed (append safety)") {
    val base = Hnsw.build(corpus, "emb", "vec_id",
      numPartitions = clusters, clustered = true)
    val farQ = Array.fill(dim)(500.0f).toSeq
    val extraShard = base.agg(max("part")).head().getInt(0) + 1
    val extra = Hnsw.build(
        Seq((999000L, farQ)).toDF("vec_id", "emb"), "emb", "vec_id",
        numPartitions = 1)
      .withColumn("part", lit(extraShard))
    val idx = base.unionByName(extra)
    val hit = KnnJoin.hnsw(idx, Seq((7L, farQ)).toDF("qid", "qv"),
        "qid", "qv", k = 1, probeParts = 1)
      .select("ext_id").as[Long].collect()
    assert(hit.toSeq === Seq(999000L),
      "knn join pruned a shard it had never seen a centroid for")
  }

  test("ivf knn join: probe-all ≡ ivfBatchTopK; routed nprobe prunes") {
    val (assigned, centroids) =
      VectorSearch.ivfBuild(corpus, "emb", "vec_id", nlist = clusters)
    val cs = Seq(1, 4, 7)
    // probe-all + exact: row-identical to the driver-batch form
    val joined = KnnJoin.ivf(assigned, centroids, "emb", "vec_id",
        qdf(cs), "qid", "qv", metric = "l2", k = 10, nprobe = clusters,
        exact = true)
      .select("query_id", "ext_id", "rank", "score").collect().toSeq
    val batch = VectorSearch.ivfBatchTopK(assigned, centroids, "emb",
        "vec_id", cs.map(c => (c.toLong, queryFor(c))), metric = "l2",
        k = 10, nprobe = clusters, exact = true)
      .select(col("query_id"), col("vec_id").as("ext_id"), col("rank"),
        col("score"))
      .orderBy("query_id", "rank").collect().toSeq
    assert(joined === batch)
    // routed nprobe=2 keeps each cluster query's own neighborhood
    val routed = KnnJoin.ivf(assigned, centroids, "emb", "vec_id",
        qdf(0 until clusters), "qid", "qv", metric = "l2", k = 10,
        nprobe = 2)
      .select("query_id", "ext_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0 until clusters).foreach { c =>
      val truth = exactTopK(queryFor(c), 10).toSet
      assert((routed(c.toLong) intersect truth).size >= 8,
        s"ivf knn-join nprobe=2 recall collapsed for cluster $c")
    }
  }

  test("null and wrong-dimension query vectors produce no rows") {
    val idx = Hnsw.build(corpus, "emb", "vec_id", numPartitions = clusters,
      clustered = true)
    val queries = Seq(
      (1L, Some(queryFor(1))),
      (2L, None),
      (3L, Some(Seq(1.0f, 2.0f)))) // wrong dim
      .toDF("qid", "qv")
    for (p <- Seq(0, 2)) { // probe-all AND routed paths
      val got = KnnJoin.hnsw(idx, queries, "qid", "qv", k = 5,
          probeParts = p)
        .select("query_id").distinct().as[Long].collect().toSet
      assert(got === Set(1L), s"probeParts=$p returned $got")
    }
  }

  test("a query vector with null ELEMENTS is dropped like a wrong dim") {
    // a null slot would otherwise route (and walk) on a 0-substituted
    // value — ADVICE r19: match QintPairReduction's null-element contract
    val idx = Hnsw.build(corpus, "emb", "vec_id", numPartitions = clusters,
      clustered = true)
    val good = queryFor(2).map(Option(_))
    val holed = good.updated(3, Option.empty[Float])
    val queries = Seq((1L, good), (2L, holed)).toDF("qid", "qv")
    for (p <- Seq(0, 2)) { // probe-all AND routed paths
      val got = KnnJoin.hnsw(idx, queries, "qid", "qv", k = 5,
          probeParts = p)
        .select("query_id").distinct().as[Long].collect().toSet
      assert(got === Set(1L), s"probeParts=$p returned $got")
    }
  }

  /** Partition directories actually read by `df`'s file scan(s), from
    * the executed plan's `numPartitions` metric — `inputFiles` cannot
    * prove partition pruning (it lists the relation's whole FileIndex,
    * filters ignored). Collects `df` first so the metric is populated.
    */
  private def partitionsRead(df: DataFrame): Long = {
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case o => (o.children ++ o.subqueries).flatMap(scans)
    }
    val ss = scans(df.queryExecution.executedPlan)
    assert(ss.nonEmpty, "no file scan in the executed plan")
    ss.map(_.metrics("numPartitions").value).sum
  }

  /** Total file-scan input bytes across every stage `body` runs — the
    * r21 walk reads the index inside an RDD lineage, so per-scan
    * `numPartitions` metrics are no longer reachable from the final
    * plan; bytes read ARE (and prove the same pruning).
    */
  private def inputBytesOf(body: => Unit): Long = {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          bytes.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(l)
    try { body; Thread.sleep(500) } // let async listener events drain
    finally spark.sparkContext.removeSparkListener(l)
    bytes.get
  }

  test("routed join reads only the routed part directories (persisted)") {
    // VERDICT r19 #1: the index side must prune to the routed-part union
    // — on a partitionBy("part") layout that is whole directories, the
    // same proof GraphRoutingSpec pins for the driver-batch reads. The
    // r21 walk scans the index inside its RDD lineage, so the proof is
    // byte-based: two 1-probe queries (≤2 of 8 directories) must read
    // well under half the bytes a probe-all join reads.
    val path = tmpDir("knnjoin_pruned") + "/idx"
    Hnsw.build(corpus, "emb", "vec_id", numPartitions = clusters,
        clustered = true)
      .write.partitionBy("part").parquet(path)
    val reread = spark.read.parquet(path)
    val hint = PartitionedIndex.partIds(spark, path)
    assert(hint.exists(_.size >= 4), s"expected a sharded layout, got $hint")
    val joined = KnnJoin.hnsw(reread, qdf(Seq(1, 6)), "qid", "qv", k = 10,
      probeParts = 1, partsHint = hint)
    var got: Map[Long, Set[Long]] = Map.empty
    val routedBytes = inputBytesOf {
      got = joined.select("query_id", "ext_id").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    }
    val allBytes = inputBytesOf {
      KnnJoin.hnsw(reread, qdf(Seq(1, 6)), "qid", "qv", k = 10,
        probeParts = 0, partsHint = hint).collect()
    }
    assert(routedBytes > 0 && routedBytes * 2 < allBytes,
      s"pruned join read $routedBytes of the probe-all $allBytes bytes " +
        s"— expected ≤2 of ${hint.get.size} part directories")
    // pruning must not cost recall: each query still finds its cluster
    Seq(1, 6).foreach { c =>
      val truth = exactTopK(queryFor(c), 10).toSet
      assert((got(c.toLong) intersect truth).size >= 8,
        s"pruned knn-join recall collapsed for cluster $c")
    }
  }

  test("ivf join prunes the assigned side to the probed cells") {
    val path = tmpDir("knnjoin_ivf_pruned") + "/assigned"
    val (assigned, centroids) =
      VectorSearch.ivfBuild(corpus, "emb", "vec_id", nlist = clusters)
    assigned.write.partitionBy("cell").parquet(path)
    val reread = spark.read.parquet(path)
    val joined = KnnJoin.ivf(reread, centroids, "emb", "vec_id",
      qdf(Seq(2)), "qid", "qv", metric = "l2", k = 10, nprobe = 1)
    val read = partitionsRead(joined)
    assert(read === 1L,
      s"one query at nprobe=1 must read 1 cell directory, read $read")
    val truth = exactTopK(queryFor(2), 10).toSet
    val got = joined.select("ext_id").as[Long].collect().toSet
    assert((got intersect truth).size >= 8, "pruned ivf join lost recall")
  }

  test("ivf join refuses a non-integral id column loudly") {
    // ADVICE r19: a string id would silently cast to all-null ext_ids
    val (assigned, centroids) =
      VectorSearch.ivfBuild(corpus.withColumn("vec_id",
        concat(lit("row-"), col("vec_id"))), "emb", "vec_id",
        nlist = clusters)
    val e = intercept[IllegalArgumentException] {
      KnnJoin.ivf(assigned, centroids, "emb", "vec_id", qdf(Seq(1)),
        "qid", "qv", metric = "l2", k = 5, nprobe = clusters)
    }
    assert(e.getMessage.contains("fit a long ext_id"))
  }
}
