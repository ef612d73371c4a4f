package graft.operators

/** Primitive building blocks for the graph-ANN hot loops (guide §1.2
  * step 2 / §4: per-task work — the builds' inner loops allocated a
  * boxed `(Double, Int)` tuple per candidate and boxed every adjacency
  * read; at 32 concurrent build tasks the allocation pressure showed up
  * as GC-bound anti-scaling, VERDICT r21 #2/#4).
  *
  * Every structure replicates the EXACT semantics of the collection it
  * replaces — [[DistHeap]] is scala.collection.mutable.PriorityQueue's
  * algorithm verbatim (1-based array, strict-less fixUp, right-child-
  * preferring fixDown), [[ScoredBuf.stableSortByDist]] is a stable merge
  * sort like the TimSort it replaces — so dequeue/sort order INCLUDING
  * TIES is bit-identical and the built graphs are unchanged
  * ([[GraphEquivalenceSpec]] pins old-vs-new adjacency on fixed seeds).
  */
private[operators] object GraphPrims {

  /** Growable primitive int array (the adjacency-list shape). */
  final class IntVec(initial: Int = 8) extends Serializable {
    private var a = new Array[Int](math.max(initial, 2))
    private var n = 0
    def length: Int = n
    def isEmpty: Boolean = n == 0
    def apply(i: Int): Int = a(i)
    def clear(): Unit = n = 0
    def add(v: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
      a(n) = v; n += 1
    }
    def addAll(vs: IntVec): Unit = {
      var i = 0; while (i < vs.n) { add(vs.a(i)); i += 1 }
    }
    def contains(v: Int): Boolean = {
      var i = 0
      while (i < n) { if (a(i) == v) return true; i += 1 }
      false
    }
    def toSeq: Seq[Int] = {
      val b = Vector.newBuilder[Int]
      var i = 0; while (i < n) { b += a(i); i += 1 }
      b.result()
    }
  }

  /** Parallel (dist, node) buffer with a STABLE ascending-by-dist sort —
    * the `ArrayBuffer[(Double, Int)].sortInPlace()(Ordering.by(_._1))`
    * twin (TimSort is stable; so is this bottom-up merge).
    */
  final class ScoredBuf(initial: Int = 16) {
    var ds = new Array[Double](math.max(initial, 2))
    var ns = new Array[Int](math.max(initial, 2))
    var len = 0
    def add(d: Double, node: Int): Unit = {
      if (len == ds.length) {
        ds = java.util.Arrays.copyOf(ds, ds.length * 2)
        ns = java.util.Arrays.copyOf(ns, ns.length * 2)
      }
      ds(len) = d; ns(len) = node; len += 1
    }
    def dist(i: Int): Double = ds(i)
    def node(i: Int): Int = ns(i)

    /** Stable bottom-up merge sort ascending by dist (ties keep insert
      * order). */
    def stableSortByDist(): Unit = {
      if (len < 2) return
      var src_d = ds; var src_n = ns
      var tmp_d = new Array[Double](len); var tmp_n = new Array[Int](len)
      var width = 1
      while (width < len) {
        var lo = 0
        while (lo < len) {
          val mid = math.min(lo + width, len)
          val hi = math.min(lo + 2 * width, len)
          var i = lo; var j = mid; var k = lo
          while (i < mid && j < hi) {
            // stable: left wins on ties
            if (src_d(i) <= src_d(j)) {
              tmp_d(k) = src_d(i); tmp_n(k) = src_n(i); i += 1
            } else { tmp_d(k) = src_d(j); tmp_n(k) = src_n(j); j += 1 }
            k += 1
          }
          while (i < mid) { tmp_d(k) = src_d(i); tmp_n(k) = src_n(i); i += 1; k += 1 }
          while (j < hi) { tmp_d(k) = src_d(j); tmp_n(k) = src_n(j); j += 1; k += 1 }
          lo = hi
        }
        val sd = src_d; val sn = src_n
        src_d = tmp_d; src_n = tmp_n; tmp_d = sd; tmp_n = sn
        width *= 2
      }
      if (src_d ne ds) {
        System.arraycopy(src_d, 0, ds, 0, len)
        System.arraycopy(src_n, 0, ns, 0, len)
      }
    }
  }

  /** Primitive (dist, node) binary heap — scala PriorityQueue's exact
    * algorithm on parallel arrays. `nearestFirst = true` dequeues the
    * SMALLEST dist (the `Ordering.by(_._1).reverse` candidate queue);
    * `false` dequeues the LARGEST (the plain result queue). Ties land
    * exactly where the boxed PQ put them: same strict-less fixUp, same
    * right-child-preferring fixDown, same last-to-root dequeue.
    */
  final class DistHeap(nearestFirst: Boolean, initial: Int = 17) {
    private var ds = new Array[Double](math.max(initial, 4))
    private var ns = new Array[Int](math.max(initial, 4))
    private var n = 0 // elements in slots 1..n (slot 0 unused, like PQ)

    // "i precedes j toward the root" per the PQ's ordering: the PQ is a
    // max-heap under ord; with .reverse "max" is the smallest dist
    @inline private def lt(i: Int, j: Int): Boolean =
      if (nearestFirst) ds(i) > ds(j) else ds(i) < ds(j)

    def size: Int = n
    def nonEmpty: Boolean = n > 0
    def headDist: Double = ds(1)
    def headNode: Int = ns(1)
    def clear(): Unit = n = 0

    def enqueue(d: Double, node: Int): Unit = {
      n += 1
      if (n >= ds.length) {
        ds = java.util.Arrays.copyOf(ds, ds.length * 2)
        ns = java.util.Arrays.copyOf(ns, ns.length * 2)
      }
      ds(n) = d; ns(n) = node
      // fixUp: swap while parent strictly precedes... (PQ: while
      // ord.lt(parent, child))
      var k = n
      while (k > 1 && lt(k >> 1, k)) {
        val pd = ds(k >> 1); val pn = ns(k >> 1)
        ds(k >> 1) = ds(k); ns(k >> 1) = ns(k)
        ds(k) = pd; ns(k) = pn
        k >>= 1
      }
    }

    /** Remove the head (read headDist/headNode FIRST). PQ's dequeue:
      * move the last element to the root, fixDown over the remaining
      * n-1 elements.
      */
    def dequeue(): Unit = {
      ds(1) = ds(n); ns(1) = ns(n); n -= 1
      var k = 1
      while (n >= 2 * k) {
        var j = 2 * k
        if (j < n && lt(j, j + 1)) j += 1
        if (!lt(k, j)) return
        val hd = ds(k); val hn = ns(k)
        ds(k) = ds(j); ns(k) = ns(j)
        ds(j) = hd; ns(j) = hn
        k = j
      }
    }
  }
}
