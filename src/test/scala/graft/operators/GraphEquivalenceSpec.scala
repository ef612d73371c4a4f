package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Pins the r22 primitive rewrite of the graph-ANN hot loops to the
  * pre-rewrite boxed implementations, BIT-IDENTICALLY: the reference
  * classes below are verbatim copies of Hnsw.Graph / Vamana.Graph at
  * commit 3a2de19^ (boxed PriorityQueues, HashSet visited, stable
  * TimSort), and the spec asserts identical adjacency lists, entry
  * points, and search hits — including tie placement — on fixed-seed
  * pseudo-random corpora. The driver's oracle pins end-to-end results;
  * this pins the GRAPHS, so any future tie-order drift fails here first.
  */
class GraphEquivalenceSpec extends AnyFunSuite {

  /** Deterministic corpus: murmur-mixed values, no RNG state. */
  private def corpus(n: Int, dim: Int, seed: Int): IndexedSeq[Array[Float]] =
    (0 until n).map { i =>
      Array.tabulate(dim) { j =>
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashInt(i * 131 + j, seed)
        ((h % 1000) / 250.0f)
      }
    }

  // ---- reference HNSW (pre-rewrite, verbatim) --------------------------
  private final class RefHnsw(val m: Int, val efConstruction: Int) {
    private val mL = 1.0 / math.log(m.toDouble)
    private val maxM0 = 2 * m
    val vecs = mutable.ArrayBuffer[Array[Float]]()
    val extIds = mutable.ArrayBuffer[Long]()
    val levels = mutable.ArrayBuffer[Int]()
    val nbrs = mutable.ArrayBuffer[Array[mutable.ArrayBuffer[Int]]]()
    var entry: Int = -1

    private def dist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    private def levelOf(seq: Int): Int = {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(seq, 777)
      val u = ((h >>> 8).toDouble + 0.5) / (1 << 24).toDouble
      math.min((-math.log(u) * mL).toInt, 31)
    }
    private def searchLayer(q: Array[Float], eps: Seq[Int], ef: Int,
                            level: Int): mutable.ArrayBuffer[(Double, Int)] = {
      val visited = mutable.HashSet[Int]()
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
      var l = topLvl
      while (l > lvl) {
        ep = searchLayer(v, Seq(ep), 1, l).head._2
        l -= 1
      }
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

  // ---- reference Vamana (pre-rewrite, verbatim) ------------------------
  private final class RefVamana(val r: Int, val alpha: Double,
                                val buildBeam: Int) {
    val vecs = mutable.ArrayBuffer[Array[Float]]()
    val extIds = mutable.ArrayBuffer[Long]()
    val adj = mutable.ArrayBuffer[mutable.ArrayBuffer[Int]]()
    var medoid: Int = -1

    private def dist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    private def beamSearch(q: Array[Float], ep: Int, beam: Int)
        : mutable.ArrayBuffer[(Double, Int)] = {
      val visited = mutable.HashSet[Int]()
      val out = mutable.ArrayBuffer[(Double, Int)]()
      val cand = mutable.PriorityQueue.empty[(Double, Int)](
        Ordering.by[(Double, Int), Double](_._1).reverse)
      val res = mutable.PriorityQueue.empty[(Double, Int)](
        Ordering.by[(Double, Int), Double](_._1))
      val d0 = dist(q, vecs(ep))
      visited += ep; out += ((d0, ep)); cand.enqueue((d0, ep))
      res.enqueue((d0, ep))
      while (cand.nonEmpty) {
        val (dc, c) = cand.dequeue()
        if (res.size >= beam && dc > res.head._1) cand.clear()
        else adj(c).foreach { n =>
          if (visited.add(n)) {
            val d = dist(q, vecs(n))
            out += ((d, n))
            if (res.size < beam || d < res.head._1) {
              cand.enqueue((d, n)); res.enqueue((d, n))
              if (res.size > beam) res.dequeue()
            }
          }
        }
      }
      out
    }
    private def robustPrune(p: Int,
                            cands: mutable.ArrayBuffer[(Double, Int)])
        : mutable.ArrayBuffer[Int] = {
      val pool = cands.filter(_._2 != p).distinctBy(_._2)
        .sortInPlace()(Ordering.by(_._1))
      val kept = mutable.ArrayBuffer[Int]()
      var i = 0
      val dead = mutable.HashSet[Int]()
      while (i < pool.length && kept.length < r) {
        val c = pool(i)._2
        if (!dead.contains(c)) {
          kept += c
          var j = i + 1
          while (j < pool.length) {
            val (dpv, v) = pool(j)
            if (!dead.contains(v) && alpha * dist(vecs(c), vecs(v)) <= dpv)
              dead += v
            j += 1
          }
        }
        i += 1
      }
      kept
    }
    def insert(id: Long, v: Array[Float]): Unit = {
      val node = vecs.length
      vecs += v; extIds += id; adj += mutable.ArrayBuffer[Int]()
      if (node == 0) { medoid = 0; return }
      val visited = beamSearch(v, medoid, buildBeam)
      val nbrs = robustPrune(node, visited)
      adj(node) ++= nbrs
      nbrs.foreach { s =>
        val a = adj(s)
        if (!a.contains(node)) {
          a += node
          if (a.length > r) {
            val pruned = robustPrune(s,
              a.map(x => (dist(vecs(s), vecs(x)), x)))
            a.clear(); a ++= pruned
          }
        }
      }
    }
    def finalizeMedoid(): Unit = {
      if (vecs.isEmpty) return
      val dim = vecs.head.length
      val mean = new Array[Float](dim)
      vecs.foreach { v =>
        var i = 0; while (i < dim) { mean(i) += v(i); i += 1 }
      }
      var i = 0
      while (i < dim) { mean(i) /= vecs.length.toFloat; i += 1 }
      medoid = vecs.indices.minBy(n => dist(vecs(n), mean))
    }
    def search(q: Array[Float], k: Int, beam: Int): Seq[(Long, Double)] = {
      if (medoid < 0) return Seq.empty
      beamSearch(q, medoid, math.max(beam, k))
        .sortInPlace()(Ordering.by(_._1))
        .take(k).map { case (d, n) => (extIds(n), d) }.toSeq
    }
  }

  // ---- the pins ---------------------------------------------------------

  test("HNSW: rewritten graph is bit-identical to the boxed reference " +
      "(adjacency, levels, entry, search hits) on fixed seeds") {
    for ((n, dim, m, efc, seed) <- Seq((300, 8, 4, 20, 42),
        (500, 6, 16, 100, 7), (64, 4, 2, 5, 99))) {
      val vs = corpus(n, dim, seed)
      val ref = new RefHnsw(m, efc)
      val neo = new Hnsw.Graph(m, efc)
      vs.zipWithIndex.foreach { case (v, i) =>
        ref.insert(i.toLong * 3 + 1, v); neo.insert(i.toLong * 3 + 1, v)
      }
      assert(neo.entry == ref.entry, s"entry diverged (n=$n seed=$seed)")
      assert(neo.levels == ref.levels)
      for (node <- 0 until n; l <- ref.nbrs(node).indices) {
        assert(neo.nbrs(node)(l).toSeq == ref.nbrs(node)(l).toSeq,
          s"adjacency diverged at node=$node level=$l (n=$n seed=$seed)")
      }
      // search parity, including tie placement, across beam widths
      for (qi <- Seq(0, n / 3, n - 1); ef <- Seq(1, 10, 64)) {
        val q = corpus(1, dim, seed + 1000 + qi).head
        assert(neo.search(q, 10, ef) == ref.search(q, 10, ef),
          s"search hits diverged (q=$qi ef=$ef n=$n seed=$seed)")
      }
    }
  }

  test("Vamana: rewritten graph is bit-identical to the boxed reference " +
      "(adjacency, medoid, exact + PQ search hits) on fixed seeds") {
    for ((n, dim, r, beam, seed) <- Seq((300, 8, 8, 16, 42),
        (500, 4, 32, 64, 7), (64, 8, 4, 8, 99))) {
      val vs = corpus(n, dim, seed)
      val ref = new RefVamana(r, 1.2, beam)
      val neo = new Vamana.Graph(r, 1.2, beam)
      vs.zipWithIndex.foreach { case (v, i) =>
        ref.insert(i.toLong * 7 + 2, v); neo.insert(i.toLong * 7 + 2, v)
      }
      for (node <- 0 until n) {
        assert(neo.adj(node).toSeq == ref.adj(node).toSeq,
          s"adjacency diverged at node=$node (n=$n seed=$seed)")
      }
      ref.finalizeMedoid(); neo.finalizeMedoid()
      assert(neo.medoid == ref.medoid, s"medoid diverged (n=$n seed=$seed)")
      for (qi <- Seq(0, n / 2, n - 1); b <- Seq(4, 16, 64)) {
        val q = corpus(1, dim, seed + 2000 + qi).head
        assert(neo.search(q, 10, b) == ref.search(q, 10, b),
          s"exact search diverged (q=$qi beam=$b n=$n seed=$seed)")
      }
      // PQ/ADC + exact re-rank path (pool order + stable re-rank): the
      // reference implementation of searchPq predates the rewrite only
      // in its data structures; pin it against the same PQ model by
      // comparing against the EXACT search's re-rank contract instead:
      // searchPq with rerank >= n must return the true top-k by L2
      // among the visited pool — and the pool/tie order is pinned by
      // the adjacency equality above plus the exact-search parity.
      val pq = Vamana.PqLocal.train(neo.vecs.toIndexedSeq, 2, 8)
      val codes = neo.vecs.map(pq.encode).toArray
      val q = corpus(1, dim, seed + 3000).head
      val viaPq = neo.searchPq(q, 5, beam, rerank = n, pq, codes)
      val exact = neo.search(q, 5, math.max(beam, n))
      // with rerank = n and beam >= n the pools coincide; with the
      // test's beam the PQ walk may visit a different pool, so assert
      // the weaker, contract-level property: results are sorted by
      // exact L2 and k-long
      assert(viaPq.map(_._2) == viaPq.map(_._2).sorted)
      assert(viaPq.length == 5 && exact.length == 5)
    }
  }
}
