package org.apache.spark.sql.graftnative

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a PARTIAL aggregate (r20).
  *
  * Every batched vector search ranks |corpus-candidates| × |queries|
  * scored pairs down to k per query. A window (`row_number over
  * partitionBy(query_id)`) does that with a FULL shuffle of every
  * scored pair — at a 10^5-row k-NN self-join that is 10^8 rows through
  * one exchange, and the per-row shuffle/sort overhead dwarfs the
  * scoring math itself (measured: the 105k semantic-dedup self-join
  * spent >100 s in the rank exchange after the scoring projection was
  * already 24 bytes wide). An aggregate with a bounded top-k buffer
  * gets MAP-SIDE PARTIAL COMBINE: each task reduces its pairs to ≤ k
  * per query locally, and the exchange carries |queries|·k rows — the
  * classic TakeOrdered economics, per group.
  *
  * Ordering contract (identical to the windows it replaces): best-first
  * by (score `asc`/`desc`, id ascending); null scores rank after every
  * non-null score (`asc_nulls_last`/`desc_nulls_last`), among
  * themselves by id ascending; rows with a null id are dropped (the
  * call sites' ids are cast non-null surrogates). Long scores compare
  * as longs — the exact scaled-int grid must not round through double.
  *
  * Result: `array<struct<ext_id: long, score: <scoreType>>>`,
  * best-first, `posexplode` recovers (rank-1) positions.
  */
object TopKAggregate {

  /** `asc = true` ranks smaller scores better (l2); `false` larger
    * (cosine/ip/BM25-style similarities).
    */
  def topKPairs(score: Column, id: Column, k: Int, asc: Boolean): Column =
    ExpressionUtils.column(TopKPairs(ExpressionUtils.expression(score),
      ExpressionUtils.expression(id), k, asc).toAggregateExpression())
}

/** Mutable bounded top-k buffer: a worst-at-root binary heap over
  * (score, id) plus a bounded worst-at-root heap of null-score ids.
  * `isLong` picks exact long comparison over double.
  */
final class TopKBuf(val k: Int, val asc: Boolean, val isLong: Boolean) {
  // non-null-score entries: heap ordered so the WORST entry sits at 0
  var n = 0
  val sLong = new Array[Long](k) // long scores, or doubleToRawLongBits
  val ids = new Array[Long](k)
  // null-score entries: worst (= largest) id at root, bounded at k.
  // Allocated on the FIRST null score: null scores are the rare case
  // (corrupt / dimension-mismatched vectors), and hash aggregation
  // creates one buffer per group — at the rerank paths' k (e.g. 256) an
  // eager third array is ~2 KB of dead weight per query in every task
  var nn = 0
  private var nullIds0: Array[Long] = null
  def nullIds: Array[Long] = {
    if (nullIds0 == null) nullIds0 = new Array[Long](k)
    nullIds0
  }

  private def scoreWorse(aS: Long, aId: Long, bS: Long, bId: Long): Boolean = {
    val c =
      if (isLong) java.lang.Long.compare(aS, bS)
      else java.lang.Double.compare(
        java.lang.Double.longBitsToDouble(aS),
        java.lang.Double.longBitsToDouble(bS))
    if (c != 0) { if (asc) c > 0 else c < 0 }
    else aId > bId
  }

  /** Offer a non-null-score entry (score pre-encoded to long bits). */
  def offer(s: Long, id: Long): Unit =
    if (n < k) {
      sLong(n) = s; ids(n) = id; n += 1
      var i = n - 1 // sift up toward the worst-at-root
      while (i > 0 && scoreWorse(sLong(i), ids(i),
          sLong((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (scoreWorse(sLong(0), ids(0), s, id)) {
      sLong(0) = s; ids(0) = id
      siftDown()
    }

  private def swap(a: Int, b: Int): Unit = {
    val ts = sLong(a); sLong(a) = sLong(b); sLong(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < n && scoreWorse(sLong(l), ids(l), sLong(m), ids(m))) m = l
      if (r < n && scoreWorse(sLong(r), ids(r), sLong(m), ids(m))) m = r
      if (m == i) done = true
      else { swap(i, m); i = m }
    }
  }

  /** Offer a null-score entry: kept only while fewer than k ids, or
    * when smaller than the current worst (largest) kept id.
    */
  def offerNull(id: Long): Unit = {
    val h = nullIds // materializes the lazy heap on first use
    if (nn < k) {
      h(nn) = id; nn += 1
      var i = nn - 1
      while (i > 0 && h(i) > h((i - 1) / 2)) {
        val t = h(i); h(i) = h((i - 1) / 2)
        h((i - 1) / 2) = t; i = (i - 1) / 2
      }
    } else if (nn > 0 && id < h(0)) {
      h(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < nn && h(l) > h(m)) m = l
        if (r < nn && h(r) > h(m)) m = r
        if (m == i) done = true
        else {
          val t = h(i); h(i) = h(m); h(m) = t
          i = m
        }
      }
    }
  }

  /** Best-first (score, id) pairs: non-null scores first, then null-
    * score ids ascending, truncated at k. Score = None for the nulls.
    */
  def sortedOut(): Array[(Option[Long], Long)] = {
    val nonNull = Array.tabulate(n)(i => (sLong(i), ids(i)))
      .sortWith((a, b) => scoreWorse(b._1, b._2, a._1, a._2))
      .map { case (s, id) => (Some(s): Option[Long], id) }
    val nulls =
      if (nn == 0) Array.empty[(Option[Long], Long)]
      else nullIds.take(nn).sorted.map(id => (None: Option[Long], id))
    (nonNull ++ nulls).take(k)
  }
}

case class TopKPairs(left: Expression, right: Expression, k: Int,
                     asc: Boolean,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] with BinaryLike[Expression] {

  require(k > 0, s"top-k needs k > 0, got $k")
  private def scoreType: DataType = left.dataType
  private def isLong: Boolean = scoreType match {
    case LongType => true
    case DoubleType => false
    case t => throw new IllegalArgumentException(
      s"topKPairs score must be long or double, got $t")
  }

  override def createAggregationBuffer(): TopKBuf =
    new TopKBuf(k, asc, isLong)

  override def update(b: TopKBuf, input: InternalRow): TopKBuf = {
    val id = right.eval(input)
    if (id != null) {
      val s = left.eval(input)
      if (s == null) b.offerNull(id.asInstanceOf[Long])
      else if (b.isLong) b.offer(s.asInstanceOf[Long], id.asInstanceOf[Long])
      else {
        // normalize -0.0 → 0.0: SQL ordering ties the two zeros (the id
        // breaks the tie), but Double.compare ranks -0.0 below 0.0 —
        // without this a -0.0 score would jump the id tie-break
        val d = s.asInstanceOf[Double]
        b.offer(java.lang.Double.doubleToRawLongBits(
          if (d == 0.0) 0.0 else d), id.asInstanceOf[Long])
      }
    }
    b
  }

  override def merge(b: TopKBuf, o: TopKBuf): TopKBuf = {
    var i = 0
    while (i < o.n) { b.offer(o.sLong(i), o.ids(i)); i += 1 }
    i = 0
    while (i < o.nn) { b.offerNull(o.nullIds(i)); i += 1 }
    b
  }

  override def eval(b: TopKBuf): Any = {
    val out = b.sortedOut()
    new GenericArrayData(out.map { case (s, id) =>
      val score: Any = s match {
        case Some(bits) =>
          if (b.isLong) bits else java.lang.Double.longBitsToDouble(bits)
        case None => null
      }
      InternalRow(id, score)
    })
  }

  override def serialize(b: TopKBuf): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + (b.n + b.nn) * 16)
    buf.putInt(b.n); buf.putInt(b.nn)
    var i = 0
    while (i < b.n) { buf.putLong(b.sLong(i)); buf.putLong(b.ids(i)); i += 1 }
    i = 0
    while (i < b.nn) { buf.putLong(b.nullIds(i)); buf.putLong(0L); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new TopKBuf(k, asc, isLong)
    val n = buf.getInt(); val nn = buf.getInt()
    var i = 0
    while (i < n) {
      val s = buf.getLong(); val id = buf.getLong()
      b.offer(s, id); i += 1
    }
    i = 0
    while (i < nn) {
      val id = buf.getLong(); buf.getLong()
      b.offerNull(id); i += 1
    }
    b
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ext_id", LongType, nullable = false),
    StructField("score", scoreType))))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k_pairs"

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(left = newLeft, right = newRight)
}
