package graft.format

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-based fuzz of the GRAPH-ANN ROUTING LIFECYCLE (VERDICT r18 #6):
  * random interleavings of append / updateVectorIndex /
  * optimizeVectorIndex / pop-rebuild / vacuum, with ROUTED searches
  * checked after every step against the probe-all model:
  *
  *   - `probeShards = huge` must equal probe-all EXACTLY (routing with
  *     p ≥ cells probes every routed shard, and sentinel-less shards
  *     are always probed — so any divergence is a routing bug, not
  *     approximation);
  *   - `probeShards = 1` must return full-k results whose rows all
  *     exist in the live snapshot (no resurrected pops, no vacuumed
  *     dangles) with the query row's own distance-0 hit present when
  *     the query IS a live row (its nearest cell contains it);
  *   - after a CORRUPTED routing artifact (stale shard ids at lying
  *     centroids — the crash-between-rewrites shape), the routed search
  *     must heal to probe-all-equal results, never empty.
  *
  * The interleavings cover what pointwise specs cannot: delta shards
  * folding into the artifact across several appends, rebuilds resetting
  * shard ids while the artifact follows, vacuum running between the
  * two, and searches landing after every such transition.
  */
class VectorRoutingFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 6
  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("emb", ArrayType(FloatType))))

  /** Deterministic clustered vector for a row id: 4 well-separated
    * blobs with hash jitter, so k-means shards are meaningful.
    */
  private def vec(id: Long): Seq[Float] = {
    val c = (id % 4).toInt
    Array.tabulate(dim) { d =>
      val base = if (d == c) 20.0f * (c + 1) else 0.0f
      val h = scala.util.hashing.MurmurHash3.productHash((id, d))
      base + (h % 1000) / 1000.0f
    }.toSeq
  }

  for (seed <- Seq(1317, 90125))
  test(s"routed ≡ probe-all across maintenance interleavings (seed $seed)") {
    val rnd = new scala.util.Random(seed)
    val root = tmpDir("vrfuzz") + "/t"
    val ds = GraftDataset.create(spark, root, schema)
    var nextId = 0L
    var live = Map.empty[Long, Seq[Float]]

    def appendBatch(n: Int): Unit = {
      val rows = (0 until n).map { _ =>
        val id = nextId; nextId += 1; id -> vec(id)
      }
      ds.append(rows.toDF("vec_id", "emb"))
      ds.commit(s"append ${rows.size}")
      live ++= rows
    }

    def liveUuidToVecId(): Map[Long, Long] =
      spark.read.format("graft").option("withUuid", "true").load(root)
        .select(col("_uuid"), col("vec_id"))
        .as[(Long, Long)].collect().toMap

    /** `selfCellSound`: the query row's "my own cell is my nearest
      * centroid" invariant holds only when EVERY row was assigned
      * against one centroid set — i.e. after a full (re)build. After an
      * incremental delta append, a base row's nearest centroid can be
      * the delta's (mixed-cluster) centroid, which does not contain it
      * — the documented routing erosion appends cause until the next
      * rebuild, not a bug.
      */
    def check(where: String, selfCellSound: Boolean): Unit = {
      val uuidMap = liveUuidToVecId()
      assert(uuidMap.values.toSet == live.keySet,
        s"$where: snapshot != model")
      val k = math.min(5, live.size)
      if (k == 0) return
      val qid = live.keys.toSeq.sorted.apply(rnd.nextInt(live.size))
      val q = live(qid)
      def hits(p: Int): Seq[(Long, Double)] =
        ds.vectorSearch("emb", q, k, metric = "l2", probeShards = p)
          .select(col("row_uuid"), col("score"))
          .as[(Long, Double)].collect().toSeq
          .sortBy(h => (h._2, h._1))
      // p ≥ cells probes everything: EXACT equality with probe-all
      val all = hits(0)
      assert(hits(9999) == all,
        s"$where: probeShards=all diverged from probe-all")
      assert(all.size == k, s"$where: probe-all returned ${all.size} of $k")
      // the query row's distance-0 self hit is in the probe-all top-k
      assert(all.exists { case (u, s) => uuidMap(u) == qid && s == 0.0 },
        s"$where: probe-all lost the query row's own zero-distance hit")
      // p=1: full-k, every row live, and POINTWISE score dominance —
      // routing probes a candidate subset of probe-all's (per-shard
      // walks are routing-independent), so sorted routed scores can
      // never beat sorted probe-all scores
      val routed = hits(1)
      assert(routed.size == k, s"$where: p=1 returned ${routed.size} of $k")
      routed.foreach { case (u, _) =>
        assert(uuidMap.contains(u), s"$where: p=1 returned a dead row $u")
      }
      routed.zip(all).foreach { case ((_, rs), (_, as)) =>
        assert(rs >= as,
          s"$where: routed subset found a closer row than probe-all")
      }
      if (selfCellSound)
        assert(routed.exists { case (u, s) => uuidMap(u) == qid && s == 0.0 },
          s"$where: p=1 routing pruned the query's own cell")
      // the DATASET-LEVEL knn join must agree with vectorSearch at
      // probe-all after every lifecycle transition (same walks, same
      // scores — a one-row query table exercises the whole join path:
      // routing artifact read, cell grouping, cogroup, score mapping)
      val viaJoin = ds.vectorKnnJoin("emb",
          Seq((qid, q)).toDF("qid", "qv"), "qid", "qv", k,
          metric = "l2")
        .select(col("row_uuid"), col("score"))
        .as[(Long, Double)].collect().toSeq.sortBy(h => (h._2, h._1))
      assert(viaJoin == all,
        s"$where: vectorKnnJoin diverged from vectorSearch at probe-all")
      // the ROUTED join (p=1) under the same invariants as routed
      // vectorSearch: full-k, live rows only, pointwise score dominance
      // vs probe-all, self hit when assignment is single-epoch — this is
      // the r19 stale-centroid re-route path (KnnJoin.run) under every
      // lifecycle transition, not just the pointwise specs
      val joinRouted = ds.vectorKnnJoin("emb",
          Seq((qid, q)).toDF("qid", "qv"), "qid", "qv", k,
          metric = "l2", probeShards = 1)
        .select(col("row_uuid"), col("score"))
        .as[(Long, Double)].collect().toSeq.sortBy(h => (h._2, h._1))
      assert(joinRouted.size == k,
        s"$where: routed join returned ${joinRouted.size} of $k")
      joinRouted.foreach { case (u, _) =>
        assert(uuidMap.contains(u), s"$where: routed join returned a dead row $u")
      }
      joinRouted.zip(all).foreach { case ((_, rs), (_, as)) =>
        assert(rs >= as,
          s"$where: routed join found a closer row than probe-all")
      }
      if (selfCellSound)
        assert(joinRouted.exists { case (u, s) => uuidMap(u) == qid && s == 0.0 },
          s"$where: routed join pruned the query's own cell")
    }

    appendBatch(40)
    ds.createVectorIndex("emb", indexType = "HNSW", metric = "l2")
    check("initial build", selfCellSound = true)

    var selfCellSound = true
    for (op <- 1 to 10) {
      rnd.nextInt(6) match {
        case 0 | 1 => // append a delta: new clustered shard + folded routing
          appendBatch(5 + rnd.nextInt(12))
          ds.updateVectorIndex("emb")
          selfCellSound = false // delta centroids may shadow base cells
        case 2 => // pop a slice: non-append delta forces a full rebuild
          val m = 3 + rnd.nextInt(3)
          val r = rnd.nextInt(m)
          ds.pop(pmod(col("vec_id"), lit(m)) === r)
          ds.commit(s"pop $m/$r")
          live = live.filter { case (id, _) => id % m != r }
          ds.updateVectorIndex("emb")
          selfCellSound = true // non-append delta rebuilds from scratch
        case 3 => // compaction rebuild with recorded params
          ds.optimizeVectorIndex("emb")
          selfCellSound = true
        case 4 => // aggressive vacuum between index transitions
          ds.vacuum(olderThanMs = -60000L)
        case 5 => // plain append WITHOUT index maintenance, then update:
          // the index is stale in between (searches would require), so
          // maintenance runs before the check
          appendBatch(3 + rnd.nextInt(5))
          ds.updateVectorIndex("emb")
          selfCellSound = false
      }
      check(s"seed $seed op $op", selfCellSound)
    }

    // CORRUPTED routing artifact: claims every real shard at a lying
    // far-away centroid AND routes everything toward a shard id that
    // does not exist — the stale-artifact crash shape. Routed searches
    // must heal (WARN + probe-all), never return empty/wrong rows.
    val dir = new Path(root, "_graft/indexes/vector/emb")
    val graph = spark.read.parquet(new Path(dir, "graph").toString)
    val realIds = graph.select(col("part").cast("int"))
      .distinct().as[Int].collect().toSeq
    val far = Array.fill(dim)(-9999.0f).toSeq
    val bogus = (realIds.map(id => (id, far)) :+ (999, vec(0L)))
      .toDF("part", "vec")
    bogus.coalesce(1).write.mode("overwrite")
      .parquet(new Path(dir, "routing").toString)
    val uuidMap = liveUuidToVecId()
    val k = math.min(5, live.size)
    val qid = live.keys.min
    val healedRouted = ds.vectorSearch("emb", live(qid), k, metric = "l2",
        probeShards = 1)
      .select(col("row_uuid"), col("score"))
      .as[(Long, Double)].collect().toSeq.sortBy(h => (h._2, h._1))
    val probeAll = ds.vectorSearch("emb", live(qid), k, metric = "l2")
      .select(col("row_uuid"), col("score"))
      .as[(Long, Double)].collect().toSeq.sortBy(h => (h._2, h._1))
    assert(healedRouted == probeAll,
      "corrupted routing artifact must heal to probe-all results")
    assert(healedRouted.exists { case (u, s) => uuidMap(u) == qid && s == 0.0 })
    // the routed JOIN must heal the same way: its bogus shard id (999)
    // is re-routed against the surviving cells, which all carry the
    // artifact's lying identical centroid — one logical cell spanning
    // every real shard, so the healed route IS probe-all
    val healedJoin = ds.vectorKnnJoin("emb",
        Seq((qid, live(qid))).toDF("qid", "qv"), "qid", "qv", k,
        metric = "l2", probeShards = 1)
      .select(col("row_uuid"), col("score"))
      .as[(Long, Double)].collect().toSeq.sortBy(h => (h._2, h._1))
    assert(healedJoin == probeAll,
      "corrupted routing artifact must heal the routed knn join too")
  }
}
