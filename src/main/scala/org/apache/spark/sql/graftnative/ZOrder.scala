package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-order (Morton) clustering key — TRUE multi-column interleave, the
  * upgrade over range-clustering's lexicographic (first-column-wins)
  * order. Each cluster column is rank-normalized into a 2^bits bucket id
  * by binary search over sampled quantile boundaries (the same idea as
  * Delta's OPTIMIZE ZORDER range_partition_id pass), and the bucket ids'
  * bits are interleaved into one long. Range-partitioning on that key
  * gives every output file a contiguous Morton range ≈ a hyper-rectangle
  * of the column space, so per-file min/max stats become tight on EVERY
  * cluster column and manifest file skipping prunes single-column
  * predicates on any of them — lexicographic sort only ever tightens the
  * leading column.
  *
  * Buckets, not raw values, are interleaved: Morton codes only localize
  * when the per-column domains are balanced, which rank-normalization
  * guarantees regardless of the raw distributions (skew, outliers,
  * strings).
  */
object ZOrder {

  /** Bucket id of `v` = number of boundaries ≤ v (monotone in v;
    * boundaries sorted ascending, duplicates removed). NaN lands in the
    * top bucket (Double.compare order), which only affects locality,
    * never correctness.
    */
  def bucketDouble(v: Double, bounds: Array[Double]): Int = {
    val i = java.util.Arrays.binarySearch(bounds, v)
    if (i >= 0) i + 1 else -i - 1
  }

  /** String bucket via unsigned-UTF-8-byte order — the same comparator
    * parquet min/max stats use, so file ranges and filter comparisons
    * stay in one collation.
    */
  def bucketString(v: UTF8String, bounds: Array[UTF8String]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid).binaryCompare(v) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Morton interleave: bit k of column j → output bit k*n + j.
    * Shifts in LONG space: an Int shift would wrap its count at 32 for
    * the single-column bits>31 case. */
  def interleave(ids: Array[Int], bits: Int): Long = {
    val n = ids.length
    var z = 0L
    var k = 0
    while (k < bits) {
      var j = 0
      while (j < n) {
        z |= ((ids(j).toLong >> k) & 1L) << (k * n + j)
        j += 1
      }
      k += 1
    }
    z
  }

  /** Bucket id column for a DOUBLE-cast child (nulls → bucket 0: they
    * cluster together at the low end, matching nulls-first sort order).
    */
  def rangeBucketDouble(child: Column, bounds: Array[Double]): Column =
    ExpressionUtils.column(
      RangeBucketDouble(ExpressionUtils.expression(child), bounds))

  def rangeBucketString(child: Column, bounds: Array[String]): Column =
    ExpressionUtils.column(
      RangeBucketString(ExpressionUtils.expression(child),
        bounds.map(UTF8String.fromString)))

  /** The interleaved Z-key over per-column bucket ids. */
  def interleaveBits(ids: Seq[Column], bits: Int): Column =
    ExpressionUtils.column(
      InterleaveBits(ids.map(ExpressionUtils.expression), bits))
}

case class RangeBucketDouble(child: Expression, bounds: Array[Double])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_zorder_bucket_d"

  // nulls cluster in bucket 0 instead of poisoning the whole key null
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else ZOrder.bucketDouble(v.asInstanceOf[Double], bounds)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bounds", bounds, "double[]")
    val zo = ZOrder.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      int ${ev.value} = ${c.isNull} ? 0 :
        $zo.bucketDouble(${c.value}, $b);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class RangeBucketString(child: Expression, bounds: Array[UTF8String])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_zorder_bucket_s"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else ZOrder.bucketString(v.asInstanceOf[UTF8String], bounds)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bounds", bounds,
      classOf[UTF8String].getName + "[]")
    val zo = ZOrder.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      int ${ev.value} = ${c.isNull} ? 0 :
        $zo.bucketString(${c.value}, $b);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class InterleaveBits(children: Seq[Expression], bits: Int)
  extends Expression with ExpectsInputTypes {

  require(children.nonEmpty && bits > 0 && bits <= 31 &&
    bits * children.size <= 63,
    s"bits ($bits) * columns (${children.size}) must fit a positive long " +
      "(and bucket ids are ints: bits <= 31)")

  override def inputTypes: Seq[AbstractDataType] =
    Seq.fill(children.size)(IntegerType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_zorder_interleave"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val ids = new Array[Int](children.size)
    var j = 0
    while (j < children.size) {
      val v = children(j).eval(input)
      ids(j) = if (v == null) 0 else v.asInstanceOf[Int]
      j += 1
    }
    ZOrder.interleave(ids, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val zo = ZOrder.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val ids = ctx.freshName("ids")
    val codes = children.map(_.genCode(ctx))
    val fill = codes.zipWithIndex.map { case (c, j) =>
      s"${c.code}\n$ids[$j] = ${c.isNull} ? 0 : ${c.value};"
    }.mkString("\n")
    ev.copy(code = code"""
      int[] $ids = new int[${children.size}];
      $fill
      long ${ev.value} = $zo.interleave($ids, $bits);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
