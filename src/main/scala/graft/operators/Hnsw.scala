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
  * sharding strategy distributed faiss deployments use.
  *
  * Determinism: node levels come from a murmur3 hash of the node's
  * insertion sequence (not a RNG), so a rebuild of the same partition
  * yields the same graph.
  */
object Hnsw {

  /** In-memory graph over one partition's vectors (L2 metric). */
  final class Graph(val m: Int, val efConstruction: Int) extends Serializable {
    private val mL = 1.0 / math.log(m.toDouble)
    private val maxM0 = 2 * m
    val vecs = mutable.ArrayBuffer[Array[Float]]()
    val extIds = mutable.ArrayBuffer[Long]()
    val levels = mutable.ArrayBuffer[Int]()
    // neighbors(node)(level) = adjacency list
    val nbrs = mutable.ArrayBuffer[Array[mutable.ArrayBuffer[Int]]]()
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

    /** Greedy beam search on one layer from `eps`, beam width `ef`. */
    private def searchLayer(q: Array[Float], eps: Seq[Int], ef: Int,
                            level: Int): mutable.ArrayBuffer[(Double, Int)] = {
      val visited = mutable.HashSet[Int]()
      // candidates: nearest-first; results: farthest-first (bounded by ef)
      val cand = mutable.PriorityQueue.empty[(Double, Int)](
        Ordering.by[(Double, Int), Double](_._1).reverse)
      val res = mutable.PriorityQueue.empty[(Double, Int)](
        Ordering.by[(Double, Int), Double](_._1))
      eps.foreach { e =>
        if (visited.add(e)) {
          val d = dist(q, vecs(e)); cand.enqueue((d, e)); res.enqueue((d, e))
        }
      }
      while (cand.nonEmpty) {
        val (dc, c) = cand.dequeue()
        if (res.nonEmpty && dc > res.head._1 && res.size >= ef) cand.clear()
        else {
          val adj = nbrs(c)
          if (level < adj.length) adj(level).foreach { n =>
            if (visited.add(n)) {
              val d = dist(q, vecs(n))
              if (res.size < ef || d < res.head._1) {
                cand.enqueue((d, n)); res.enqueue((d, n))
                if (res.size > ef) res.dequeue()
              }
            }
          }
        }
      }
      val out = mutable.ArrayBuffer[(Double, Int)]()
      while (res.nonEmpty) out += res.dequeue()
      out.sortInPlace()(Ordering.by(_._1))
      out
    }

    def insert(id: Long, v: Array[Float]): Unit = {
      val node = vecs.length
      val lvl = levelOf(node)
      vecs += v; extIds += id; levels += lvl
      nbrs += Array.fill(lvl + 1)(mutable.ArrayBuffer[Int]())
      if (entry < 0) { entry = node; return }
      var ep = entry
      val topLvl = levels(entry)
      // greedy descend above the node's level
      var l = topLvl
      while (l > lvl) {
        ep = searchLayer(v, Seq(ep), 1, l).head._2
        l -= 1
      }
      // connect at each level from min(topLvl, lvl) down to 0
      l = math.min(topLvl, lvl)
      var eps = Seq(ep)
      while (l >= 0) {
        val cands = searchLayer(v, eps, efConstruction, l)
        val cap = if (l == 0) maxM0 else m
        val selected = cands.take(m).map(_._2)
        nbrs(node)(l) ++= selected
        selected.foreach { s =>
          val a = nbrs(s)(l)
          a += node
          if (a.length > cap) {
            // prune to the cap nearest (simple heuristic)
            val pruned = a.map(x => (dist(vecs(s), vecs(x)), x))
              .sortBy(_._1).take(cap).map(_._2)
            a.clear(); a ++= pruned
          }
        }
        eps = cands.map(_._2).toSeq
        l -= 1
      }
      if (lvl > levels(entry)) entry = node
    }

    def search(q: Array[Float], k: Int, ef: Int): Seq[(Long, Double)] = {
      if (entry < 0) return Seq.empty
      var ep = entry
      var l = levels(entry)
      while (l > 0) { ep = searchLayer(q, Seq(ep), 1, l).head._2; l -= 1 }
      searchLayer(q, Seq(ep), math.max(ef, k), 0)
        .take(k).map { case (d, n) => (extIds(n), d) }.toSeq
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

  /** Build per-partition graphs; returns index rows (persist with
    * `.write.partitionBy("part")`). One pass, no shuffle beyond the
    * initial spread; memory bounded by partition size.
    */
  def build(df: DataFrame, vecCol: String, idCol: String,
            numPartitions: Int = 0, m: Int = 16,
            efConstruction: Int = 100): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    implicit val enc = RowEncoder.encoderFor(indexSchema)
    df.select(col(idCol).cast("long"), col(vecCol))
      .filter(col(vecCol).isNotNull)
      .repartition(parts)
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
                        k: Int, ef: Int, colocated: Boolean): DataFrame = {
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
    val spread = if (colocated) prepared
      else prepared.repartition(col("part"))
    spread.mapPartitions { rows =>
      // a task may hold several parts after the repartition: regroup
      val byPart = mutable.HashMap[Int, mutable.ArrayBuffer[Row]]()
      rows.foreach(r => byPart.getOrElseUpdate(r.getInt(0),
        mutable.ArrayBuffer[Row]()) += r)
      byPart.valuesIterator.flatMap { rs =>
        val sorted = rs.sortBy(_.getInt(1))
        val g = new Graph(16, 100)
        sorted.foreach { r =>
          g.vecs += r.getSeq[Float](3).toArray
          g.extIds += r.getLong(2)
          g.levels += r.getInt(4)
          g.nbrs += r.getSeq[scala.collection.Seq[Int]](5)
            .map(a => mutable.ArrayBuffer[Int](a.toSeq: _*)).toArray
        }
        g.entry = if (sorted.nonEmpty) sorted.head.getInt(6) else -1
        qarr.iterator.flatMap { case (qid, q) =>
          g.search(q, k, ef).map { case (id, d) => Row(qid, id, d) }
        }
      }
    }
  }

  /** Search a persisted (or freshly-built) index: each partition's rows
    * reassemble their graph(s) in memory, probe locally with beam `ef`,
    * and the driver merges `parts × k` candidate rows via
    * TakeOrderedAndProject — never the corpus. Pass `colocated = true`
    * on a freshly-built index to skip the part shuffle entirely.
    */
  def topK(index: DataFrame, query: Seq[Float], k: Int,
           ef: Int = 64, colocated: Boolean = false): DataFrame =
    localHits(index, Seq((0L, query)), k, ef, colocated)
      .select(col("ext_id"), col("l2sq"))
      .orderBy(col("l2sq").asc_nulls_last, col("ext_id").asc)
      .limit(k)

  /** Batched search: the query batch is broadcast, every subgraph is
    * walked once per query in ONE pass over the index, and the global
    * per-query top-k is a window over `parts × k × |queries|` candidate
    * rows — never the corpus. Output: (query_id, ext_id, l2sq, rank).
    */
  def batchTopK(index: DataFrame, queries: Seq[(Long, Seq[Float])],
                k: Int, ef: Int = 64, colocated: Boolean = false)
      : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("l2sq").asc_nulls_last, col("ext_id").asc)
    localHits(index, queries, k, ef, colocated)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Exchange-free search over an index persisted with
    * `partitionBy("part")`: one narrow single-task scan per part
    * directory ([[PartitionedIndex.partScans]]) — the plan has NO
    * Exchange above the index scan. Falls back to the shuffled path if
    * `path` is not a part-partitioned layout.
    */
  def topKPersisted(spark: org.apache.spark.sql.SparkSession, path: String,
                    query: Seq[Float], k: Int, ef: Int = 64): DataFrame =
    PartitionedIndex.partScans(spark, path)
      .map(scan => topK(scan, query, k, ef, colocated = true))
      .getOrElse(topK(spark.read.parquet(path), query, k, ef))
}
