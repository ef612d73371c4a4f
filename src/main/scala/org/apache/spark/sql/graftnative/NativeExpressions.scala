package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native Catalyst expressions (with `doGenCode`) for the two hottest
  * inner loops — the "(b) custom Expression beats a UDF" tier of the build
  * plan (SURVEY.md §7.3). Spark's higher-order array functions
  * (`transform`/`aggregate`) are NOT whole-stage-codegen'd: each element
  * evaluation walks an interpreted expression tree with boxing. These
  * expressions compile to tight primitive Java loops instead.
  *
  * [[MinHashSig]] is also algorithmically better than the HOF formulation
  * `transform(seeds, i -> array_min(transform(sh, s -> hash(s, i))))`: the
  * expensive string hash runs ONCE per shingle (k seed-mixes are cheap
  * int hashes), not once per (shingle, seed) pair — identical results,
  * k× fewer string hashes. Hash family preserved: murmur3(s, i) with
  * seed 42 exactly like `functions.hash(s, i)`.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` and the
  * Column↔Expression bridge are `private[sql]` — the standard placement
  * for third-party native expressions.
  */
object NativeExpressions {

  def minHashSig(shingles: Column, numHashes: Int): Column =
    ExpressionUtils.column(
      MinHashSig(ExpressionUtils.expression(shingles), numHashes))

  def minHashBands(sig: Column, rowsPerBand: Int): Column =
    ExpressionUtils.column(
      MinHashBands(ExpressionUtils.expression(sig), rowsPerBand))

  def minHashSigMod(shingles: Column, a: Array[Long], b: Array[Long],
                    p: Long): Column =
    ExpressionUtils.column(
      MinHashSigMod(ExpressionUtils.expression(shingles), a, b, p))

  def minHashBandsMod(sig: Column, rowsPerBand: Int, mult: Long,
                      mod: Long): Column =
    ExpressionUtils.column(
      MinHashBandsMod(ExpressionUtils.expression(sig), rowsPerBand, mult, mod))

  def rpLshBands(vec: Column, planesPerBand: Int, bands: Int): Column =
    ExpressionUtils.column(
      RpLshBands(ExpressionUtils.expression(vec), planesPerBand, bands))

  def rpLshBandsQ(qvec: Column, planesPerBand: Int, bands: Int, dim: Int,
                  weights: Array[Long]): Column =
    ExpressionUtils.column(
      RpLshBandsQ(ExpressionUtils.expression(qvec), planesPerBand, bands,
        dim, weights))

  def simHash32(tokens: Column): Column =
    ExpressionUtils.column(SimHash32F(ExpressionUtils.expression(tokens)))

  def simHash60Md5(tokens: Column): Column =
    ExpressionUtils.column(SimHash60Md5F(ExpressionUtils.expression(tokens)))

  def pqEncode(vec: Column, m: Int, k: Int, subDim: Int,
               codebooks: Array[Float]): Column =
    ExpressionUtils.column(
      PqEncode(ExpressionUtils.expression(vec), m, k, subDim, codebooks))

  def nearestCell(vec: Column, nlist: Int, dim: Int,
                  centroids: Array[Float]): Column =
    ExpressionUtils.column(
      NearestCell(ExpressionUtils.expression(vec), nlist, dim, centroids))

  def nearestShards(vec: Column, groups: Int, dim: Int, p: Int,
                    centroids: Array[Float], offsets: Array[Int],
                    shards: Array[Int]): Column =
    ExpressionUtils.column(
      NearestShards(ExpressionUtils.expression(vec), groups, dim, p,
        centroids, offsets, shards))

  def pqAdc(codes: Column, m: Int, k: Int, table: Array[Double]): Column =
    ExpressionUtils.column(
      PqAdc(ExpressionUtils.expression(codes), m, k, table))

  def pqAdcBatch(codes: Column, qidx: Column, m: Int, k: Int,
                 tables: Array[Double]): Column =
    ExpressionUtils.column(
      PqAdcBatch(ExpressionUtils.expression(codes),
        ExpressionUtils.expression(qidx), m, k, tables))

  def dotF(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotF(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def l2SqF(a: Column, b: Column): Column =
    ExpressionUtils.column(
      L2SqF(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def dotScaledQ(a: Column, b: Column): Column =
    ExpressionUtils.column(
      QintDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def l2SqScaledQ(a: Column, b: Column): Column =
    ExpressionUtils.column(
      QintL2Sq(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def dotQL(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotQL(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def fence(c: Column): Column =
    ExpressionUtils.column(OptimizerFence(ExpressionUtils.expression(c)))
}

/** Pass-through marked non-deterministic: pins an EXPENSIVE derived
  * column where it is written (the spark_optimization_guide §4.4 remedy,
  * applied to JVM expressions). Without it, predicate pushdown
  * substitutes the column's definition into filters and sinks them below
  * repartitions — q66's `filter(size(shingles) > 0)` re-ran the whole
  * tokenize+shingle tree per row inside the single-task scan stage
  * (measured 2.2-2.5 s per path at sf0.1), then the projection above the
  * exchange ran it AGAIN — and CollapseProject inlines a multiply-
  * referenced definition into every use site (one `array_intersect` per
  * candidate pair became up to four). The expression is genuinely
  * deterministic, so retry/recomputation stays sound — the flag only
  * switches the optimizer to single-evaluation placement.
  */
case class OptimizerFence(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Nondeterministic {
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: InternalRow): Any =
    child.eval(input)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override protected def withNewChildInternal(
      newChild: Expression): OptimizerFence = copy(child = newChild)
}

/** MinHash signature of a string array: `array<int>` of length
  * `numHashes`; slot i = min over shingles of murmur3(shingle, i).
  */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(numHashes > 0, "numHashes must be positive")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = new Array[Int](numHashes)
    java.util.Arrays.fill(sig, Int.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h1 = Murmur3_x86_32.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
        var i = 0
        while (i < numHashes) {
          val h = Murmur3_x86_32.hashInt(i, h1)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h1 = ctx.freshName("h1")
      val h = ctx.freshName("h")
      val m3 = classOf[Murmur3_x86_32].getName
      s"""
        int[] $sig = new int[$numHashes];
        java.util.Arrays.fill($sig, Integer.MAX_VALUE);
        for (int $j = 0; $j < $c.numElements(); $j++) {
          if (!$c.isNullAt($j)) {
            UTF8String $s = $c.getUTF8String($j);
            int $h1 = $m3.hashUnsafeBytes(
              $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42);
            for (int $i = 0; $i < $numHashes; $i++) {
              int $h = $m3.hashInt($i, $h1);
              if ($h < $sig[$i]) $sig[$i] = $h;
            }
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** LSH band buckets of a MinHash signature: `array<long>` of length
  * `numElements / rowsPerBand`; slot b = murmur3 fold of the signature
  * ints in band b (seed 42, element-chained like Spark's `hash` over an
  * int array). One expression = one evaluation per row, so it composes
  * with generators without the CollapseProject no-CSE recompute trap that
  * a per-band `hash(slice(sig, ...))` formulation hits (8 slices = 8
  * signature evaluations when inlined into an explode).
  */
case class MinHashBands(child: Expression, rowsPerBand: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(rowsPerBand > 0, "rowsPerBand must be positive")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override protected def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val bands = sig.numElements() / rowsPerBand
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42
      var i = b * rowsPerBand
      val end = i + rowsPerBand
      while (i < end) {
        h = Murmur3_x86_32.hashInt(sig.getInt(i), h)
        i += 1
      }
      out(b) = h.toLong
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val bands = ctx.freshName("bands")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val h = ctx.freshName("h")
      val m3 = classOf[Murmur3_x86_32].getName
      s"""
        int $bands = $c.numElements() / $rowsPerBand;
        long[] $out = new long[$bands];
        for (int $b = 0; $b < $bands; $b++) {
          int $h = 42;
          int $i = $b * $rowsPerBand;
          int $end = $i + $rowsPerBand;
          for (; $i < $end; $i++) {
            $h = $m3.hashInt($c.getInt($i), $h);
          }
          $out[$b] = (long) $h;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ENGINE-PORTABLE MinHash signature — the md5-seeded Carter-Wegman
  * family: per shingle ONE md5, H = (first 32 digest bits) mod p, then
  * slot i = min over shingles of (a(i)·H + b(i)) mod p. Every operation
  * is plain BIGINT arithmetic DuckDB/Trino reproduce verbatim (see q66's
  * oracle: `CAST(concat('0x', substr(md5(g),1,8)) AS BIGINT)` is the same
  * 32-bit prefix), unlike the murmur3 family of [[MinHashSig]], which
  * stays the fast default. Same one-hash-per-shingle shape as
  * [[MinHashSig]]: k seed-mixes are two multiplies + a mod each.
  * p must be ≤ 2^31-1 so a·H fits a long without overflow.
  */
case class MinHashSigMod(child: Expression, a: Array[Long], b: Array[Long],
                         p: Long)
  extends UnaryExpression with ExpectsInputTypes {

  require(a.nonEmpty && a.length == b.length, "a/b seed arrays must align")
  require(p > 1 && p <= 2147483647L, "p in (1, 2^31-1]")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig_mod"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = a.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val md = SimHash60Md5F.md5Local.get()
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val d = md.digest(arr.getUTF8String(j).getBytes)
        var h = 0L
        var i = 0
        while (i < 4) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
        h %= p
        i = 0
        while (i < k) {
          val v = (a(i) * h + b(i)) % p
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b, "long[]")
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
        catch (java.security.NoSuchAlgorithmException e) {
          throw new RuntimeException(e);
        }""")
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val h = ctx.freshName("h")
      val k = ctx.freshName("k")
      val v = ctx.freshName("v")
      s"""
        long[] $sig = new long[${a.length}];
        java.util.Arrays.fill($sig, Long.MAX_VALUE);
        for (int $j = 0; $j < $c.numElements(); $j++) {
          if (!$c.isNullAt($j)) {
            byte[] $d = $md.digest($c.getUTF8String($j).getBytes());
            long $h = 0L;
            for (int $k = 0; $k < 4; $k++) {
              $h = ($h << 8) | (((long) $d[$k]) & 0xffL);
            }
            $h = $h % ${p}L;
            for (int $i = 0; $i < ${a.length}; $i++) {
              long $v = ($aRef[$i] * $h + $bRef[$i]) % ${p}L;
              if ($v < $sig[$i]) $sig[$i] = $v;
            }
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ENGINE-PORTABLE LSH band buckets: slot b = left fold
  * `acc = (acc·mult + v) mod mod` over the signature values of band b —
  * plain BIGINT arithmetic a SQL oracle reproduces with a pivot + nested
  * mod expression (q66). `mult·mod` must fit a long. Same
  * one-expression-per-row shape as [[MinHashBands]] (no per-band
  * recompute when inlined into a generator).
  */
case class MinHashBandsMod(child: Expression, rowsPerBand: Int, mult: Long,
                           mod: Long)
  extends UnaryExpression with ExpectsInputTypes {

  require(rowsPerBand > 0, "rowsPerBand must be positive")
  require(mult > 0 && mod > 1 && mult < Long.MaxValue / mod,
    "mult*mod must fit a long")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands_mod"

  override protected def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val bands = sig.numElements() / rowsPerBand
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var i = b * rowsPerBand
      val end = i + rowsPerBand
      while (i < end) {
        acc = (acc * mult + sig.getLong(i)) % mod
        i += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val bands = ctx.freshName("bands")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val acc = ctx.freshName("acc")
      s"""
        int $bands = $c.numElements() / $rowsPerBand;
        long[] $out = new long[$bands];
        for (int $b = 0; $b < $bands; $b++) {
          long $acc = 0L;
          int $i = $b * $rowsPerBand;
          int $end = $i + $rowsPerBand;
          for (; $i < $end; $i++) {
            $acc = ($acc * ${mult}L + $c.getLong($i)) % ${mod}L;
          }
          $out[$b] = $acc;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH band buckets of a float vector: `array<long>` of
  * length `bands`; band b's bucket has bit p set iff the projection onto
  * pseudo-random plane (p, seed=b*7919+17) is ≥ 0. BIT-EXACT twin of the
  * HOF formulation in [[graft.operators.Dedup.rpLshBucket]] (weights
  * murmur3-chained exactly like `functions.hash(lit(p), i, lit(seed))`,
  * same double summation order), but one codegen'd loop per row instead
  * of bands × planes interpreted `aggregate` trees. A null vector element
  * nullifies every projection (bucket 0), matching HOF null propagation.
  */
case class RpLshBands(child: Expression, planesPerBand: Int, bands: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(planesPerBand > 0 && planesPerBand <= 63, "planesPerBand in (0, 63]")
  require(bands > 0, "bands must be positive")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rplsh_bands"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](bands)
    var hasNull = false
    var j = 0
    while (j < n && !hasNull) { hasNull = arr.isNullAt(j); j += 1 }
    if (!hasNull) {
      var b = 0
      while (b < bands) {
        val seed = b * 7919 + 17
        var bucket = 0L
        var p = 0
        while (p < planesPerBand) {
          val h1 = Murmur3_x86_32.hashInt(p, 42)
          var proj = 0.0
          var i = 0
          while (i < n) {
            val h3 = Murmur3_x86_32.hashInt(seed, Murmur3_x86_32.hashInt(i, h1))
            proj += arr.getFloat(i).toDouble * (h3.toDouble / 2.147483648e9)
            i += 1
          }
          if (proj >= 0) bucket += (1L << p)
          p += 1
        }
        out(b) = bucket
        b += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val hasNull = ctx.freshName("hasNull")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val seed = ctx.freshName("seed")
      val bucket = ctx.freshName("bucket")
      val h1 = ctx.freshName("h1")
      val proj = ctx.freshName("proj")
      val m3 = classOf[Murmur3_x86_32].getName
      s"""
        int $n = $c.numElements();
        long[] $out = new long[$bands];
        boolean $hasNull = false;
        for (int $j = 0; $j < $n && !$hasNull; $j++) {
          $hasNull = $c.isNullAt($j);
        }
        if (!$hasNull) {
          for (int $b = 0; $b < $bands; $b++) {
            int $seed = $b * 7919 + 17;
            long $bucket = 0L;
            for (int $p = 0; $p < $planesPerBand; $p++) {
              int $h1 = $m3.hashInt($p, 42);
              double $proj = 0.0;
              for (int $i = 0; $i < $n; $i++) {
                $proj += ((double) $c.getFloat($i)) *
                  (((double) $m3.hashInt($seed, $m3.hashInt($i, $h1)))
                    / 2.147483648E9);
              }
              if ($proj >= 0) $bucket += (1L << $p);
            }
            $out[$b] = $bucket;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RpLshBandsQ {
  /** The md5-derived plane-weight table, flattened `[band][plane][dim]`:
    * weight(b,p,i) = (first 20 bits of md5("b:p:i")) − 2^19, i.e. exactly
    * `CAST(concat('0x', substr(md5(b||':'||p||':'||i), 1, 5)) AS BIGINT)
    * − 524288` in SQL — a signed ~±5·10^5 integer. Computed ONCE on the
    * driver (bands·planes·dim longs) and shipped as a plan reference;
    * the SQL oracle re-derives the identical table from the formula.
    */
  def planeWeights(bands: Int, planesPerBand: Int, dim: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](bands * planesPerBand * dim)
    var idx = 0
    var b = 0
    while (b < bands) {
      var p = 0
      while (p < planesPerBand) {
        var i = 0
        while (i < dim) {
          val d = md.digest(s"$b:$p:$i".getBytes("UTF-8"))
          val v = (((d(0) & 0xffL) << 16) | ((d(1) & 0xffL) << 8) |
            (d(2) & 0xffL)) >>> 4
          out(idx) = v - 524288L
          idx += 1
          i += 1
        }
        p += 1
      }
      b += 1
    }
    out
  }
}

/** ENGINE-PORTABLE random-hyperplane LSH bands over a QUANTIZED
  * (`array<long>`, the 1e7-scaled qint form) vector: band b's bucket has
  * bit p set iff Σ_i qv_i · w(b,p,i) ≥ 0 with the md5-derived integer
  * weights of [[RpLshBandsQ.planeWeights]] — pure int64 arithmetic with
  * no rounding, so a SQL oracle reproduces the buckets bit-for-bit
  * (q69). Overflow headroom: |qv| ≤ ~10^7·max|x|, |w| < 2^19, so dims
  * into the tens of thousands stay far below 2^63. A null element or a
  * length ≠ dim yields NULL (the row simply generates no candidates;
  * the float twin [[RpLshBands]] instead zeroes buckets — null is
  * stricter and keeps degenerate rows out of bucket 0).
  */
case class RpLshBandsQ(child: Expression, planesPerBand: Int, bands: Int,
                       dim: Int, weights: Array[Long])
  extends UnaryExpression with ExpectsInputTypes {

  require(planesPerBand > 0 && planesPerBand <= 63, "planesPerBand in (0, 63]")
  require(bands > 0 && dim > 0, "bands and dim must be positive")
  require(weights.length == bands * planesPerBand * dim, "weight table layout")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rplsh_bands_q"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != dim) return null
    var j = 0
    while (j < n) { if (arr.isNullAt(j)) return null; j += 1 }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var p = 0
      while (p < planesPerBand) {
        val off = (b * planesPerBand + p) * dim
        var proj = 0L
        var i = 0
        while (i < dim) {
          proj += arr.getLong(i) * weights(off + i)
          i += 1
        }
        if (proj >= 0) bucket |= (1L << p)
        p += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("rpWeights", weights, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val ok = ctx.freshName("ok")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val bucket = ctx.freshName("bucket")
      val proj = ctx.freshName("proj")
      s"""
        int $n = $c.numElements();
        boolean $ok = ($n == $dim);
        for (int $j = 0; $j < $n && $ok; $j++) {
          $ok = !$c.isNullAt($j);
        }
        if (!$ok) {
          ${ev.isNull} = true;
        } else {
          long[] $out = new long[$bands];
          for (int $b = 0; $b < $bands; $b++) {
            long $bucket = 0L;
            for (int $p = 0; $p < $planesPerBand; $p++) {
              int $off = ($b * $planesPerBand + $p) * $dim;
              long $proj = 0L;
              for (int $i = 0; $i < $dim; $i++) {
                $proj += $c.getLong($i) * $w[$off + $i];
              }
              if ($proj >= 0) $bucket |= (1L << $p);
            }
            $out[$b] = $bucket;
          }
          ${ev.value} =
            new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared shape for float-array pairwise reductions compiled to primitive
  * loops. A dimension mismatch yields NULL (matching the `zip_with`
  * null-propagation these replaced) — a silent common-prefix reduction
  * would return a plausible-but-wrong similarity.
  */
abstract class FloatPairReduction extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def combineJava(acc: String, x: String, y: String): String
  protected def combineScala(x: Float, y: Float): Double

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var j = 0
      while (j < n) {
        acc += combineScala(x.getFloat(j), y.getFloat(j))
        j += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $j = 0; $j < $n; $j++) {
            ${combineJava(acc, s"$a.getFloat($j)", s"$b.getFloat($j)")}
          }
          ${ev.value} = $acc;
        }
      """
    })
}

/** 32-bit SimHash of a token array: per token murmur3 (seed 42, same
  * family as `functions.hash`), one +1/−1 vote per bit, sign → bit.
  * BIT-EXACT twin of the HOF formulation (aggregate + 32-element vote
  * arrays per token) at a fraction of the cost: one hash + 32 integer
  * ops per token in a codegen'd loop, no per-token array allocation.
  */
case class SimHash32F(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash32"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](32)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h = Murmur3_x86_32.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
        var i = 0
        while (i < 32) {
          if (((h >> i) & 1) == 1) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 32) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val m3 = classOf[Murmur3_x86_32].getName
      s"""
        int[] $votes = new int[32];
        for (int $j = 0; $j < $c.numElements(); $j++) {
          if (!$c.isNullAt($j)) {
            UTF8String $s = $c.getUTF8String($j);
            int $h = $m3.hashUnsafeBytes(
              $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42);
            for (int $i = 0; $i < 32; $i++) {
              if ((($h >> $i) & 1) == 1) $votes[$i]++; else $votes[$i]--;
            }
          }
        }
        long $out = 0L;
        for (int $i = 0; $i < 32; $i++) {
          if ($votes[$i] > 0) $out |= (1L << $i);
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60Md5F {
  /** MessageDigest is stateful and not thread-safe; the interpreted eval
    * path shares one Expression instance across partitions, so each thread
    * gets its own digest.
    */
  private[graftnative] val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Top 60 bits of the md5 digest of `bytes`, as a non-negative long —
    * bit-identical to `CAST(concat('0x', substr(md5(t),1,15)) AS BIGINT)`
    * (first 15 hex nibbles = first 7.5 digest bytes, big-endian).
    */
  def md5Top60(md: java.security.MessageDigest, bytes: Array[Byte]): Long = {
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def hashToken(bytes: Array[Byte]): Long = md5Top60(md5Local.get(), bytes)
}

/** 60-bit md5-based SimHash of a token array — the ENGINE-PORTABLE
  * fingerprint (the token hash `substr(md5(t),1,15)` is reproducible in
  * DuckDB/Trino — see q51/q67's oracle CTE in
  * `graft.catalog.TextQueries.duckSimHash60`). Same vote fold as
  * [[SimHash32F]]; the md5 runs on the token's UTF8 bytes exactly like
  * Spark's `md5(string)` (implicit string→binary cast). Replaces the
  * interpreted HOF + hex-string `conv` fold that cost ~8× on q51
  * (per-token md5-HEX string, substring, string-radix conv, 60
  * when/otherwise branches and a 60-long array per token — none of it
  * codegen'd). [[graft.operators.Dedup.simHashHof]] remains the
  * equivalence twin pinned in NativeExpressionsSpec.
  */
case class SimHash60Md5F(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60_md5"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = SimHash60Md5F.md5Local.get()
    val votes = new Array[Int](60)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = SimHash60Md5F.md5Top60(md, arr.getUTF8String(j).getBytes)
        var i = 0
        while (i < 60) {
          if (((h >> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 60) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one digest instance per generated class (codegen'd operators are
    // single-threaded per task), initialized in the class constructor
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
        catch (java.security.NoSuchAlgorithmException e) {
          throw new RuntimeException(e);
        }""")
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val h = ctx.freshName("h")
      val k = ctx.freshName("k")
      val out = ctx.freshName("out")
      s"""
        int[] $votes = new int[60];
        for (int $j = 0; $j < $c.numElements(); $j++) {
          if (!$c.isNullAt($j)) {
            byte[] $d = $md.digest($c.getUTF8String($j).getBytes());
            long $h = 0L;
            for (int $k = 0; $k < 8; $k++) {
              $h = ($h << 8) | (((long) $d[$k]) & 0xffL);
            }
            $h = $h >>> 4;
            for (int $i = 0; $i < 60; $i++) {
              if ((($h >> $i) & 1L) == 1L) $votes[$i]++; else $votes[$i]--;
            }
          }
        }
        long $out = 0L;
        for (int $i = 0; $i < 60; $i++) {
          if ($votes[$i] > 0) $out |= (1L << $i);
        }
        ${ev.value} = $out;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encoder: split a `dim = m * subDim` float vector
  * into `m` subvectors, emit for each the id (0..k-1) of its nearest
  * codebook centroid (L2, ties → lowest id). `codebooks` is laid out
  * `[subspace][centroid][subDim]` flattened. The codebook rides the plan
  * as a reference object (broadcast with the serialized expression —
  * m·k·subDim floats, driver-bounded by construction). Null vector or
  * dimension mismatch → null codes.
  */
case class PqEncode(child: Expression, m: Int, k: Int, subDim: Int,
                    codebooks: Array[Float])
  extends UnaryExpression with ExpectsInputTypes {

  require(m > 0 && k > 0 && subDim > 0)
  require(codebooks.length == m * k * subDim, "codebook layout mismatch")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * subDim) null
    else {
      val codes = new Array[Int](m)
      var mi = 0
      while (mi < m) {
        var best = 0
        var bestD = Double.MaxValue
        var ki = 0
        while (ki < k) {
          var d = 0.0
          var j = 0
          val cbOff = (mi * k + ki) * subDim
          while (j < subDim) {
            val diff = v.getFloat(mi * subDim + j).toDouble - codebooks(cbOff + j)
            d += diff * diff
            j += 1
          }
          if (d < bestD) { bestD = d; best = ki }
          ki += 1
        }
        codes(mi) = best
        mi += 1
      }
      new GenericArrayData(codes)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    nullSafeCodeGen(ctx, ev, c => {
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi")
      val ki = ctx.freshName("ki")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val off = ctx.freshName("off")
      s"""
        if ($c.numElements() != ${m * subDim}) {
          ${ev.isNull} = true;
        } else {
          int[] $codes = new int[$m];
          for (int $mi = 0; $mi < $m; $mi++) {
            int $best = 0;
            double $bestD = Double.MAX_VALUE;
            for (int $ki = 0; $ki < $k; $ki++) {
              double $d = 0.0;
              int $off = ($mi * $k + $ki) * $subDim;
              for (int $j = 0; $j < $subDim; $j++) {
                double $diff = (double) $c.getFloat($mi * $subDim + $j)
                  - (double) $cb[$off + $j];
                $d += $diff * $diff;
              }
              if ($d < $bestD) { $bestD = $d; $best = $ki; }
            }
            $codes[$mi] = $best;
          }
          ${ev.value} =
            new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest-centroid assignment (the IVF coarse quantizer): argmin over
  * `nlist` centroids by squared L2, centroids carried as ONE flat
  * `float[]` reference object (`[cell][dim]`). The Column-algebra
  * formulation this replaces (`aggregate` over an array of nlist struct
  * literals) embeds nlist·dim literal expression NODES in the plan —
  * measured 13 MiB task binaries at nlist=1024 and growing linearly, a
  * codegen/serialization blow-up that caps nlist long before the √n
  * guidance does. Here the plan carries one expression and the task
  * binary one array. Null / wrong-dimension vectors → null cell
  * (dropped by the cell joins and the NULL-cell dedup filters).
  */
case class NearestCell(child: Expression, nlist: Int, dim: Int,
                       centroids: Array[Float])
  extends UnaryExpression with ExpectsInputTypes {

  require(nlist > 0 && dim > 0)
  require(centroids.length == nlist * dim, "centroid layout mismatch")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_cell"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) null
    else {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < nlist) {
        var d = 0.0
        var j = 0
        val off = c * dim
        while (j < dim) {
          val diff = v.getFloat(j).toDouble - centroids(off + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("ivfCentroids", centroids, "float[]")
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val off = ctx.freshName("off")
      s"""
        if ($v.numElements() != $dim) {
          ${ev.isNull} = true;
        } else {
          int $best = 0;
          double $bestD = Double.MAX_VALUE;
          for (int $c = 0; $c < $nlist; $c++) {
            double $d = 0.0;
            int $off = $c * $dim;
            for (int $j = 0; $j < $dim; $j++) {
              double $diff = (double) $v.getFloat($j)
                - (double) $cents[$off + $j];
              $d += $diff * $diff;
            }
            if ($d < $bestD) { $bestD = $d; $best = $c; }
          }
          ${ev.value} = $best;
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distributed query→shard routing for the graph-ANN knn join
  * ([[graft.operators.KnnJoin]]): the DataFrame-native form of
  * [[graft.operators.GraphRouting.route]]. Returns the shard ids of the
  * query's `p` nearest LOGICAL CELLS (centroid groups — sub-shards of a
  * skew-split cell share one centroid and count as one cell, exactly
  * like the driver-side route()). The group centroids ride the plan as
  * one flat `float[]` (`[group][dim]`, groups pre-sorted by min shard
  * id so index order breaks distance ties identically to route());
  * `offsets`/`shards` flatten the group→shard-ids map. One codegen'd
  * argselect per query row — no |queries| × |shards| explode, no
  * driver collect of the query table. Null / wrong-dimension query
  * vectors → null (the row routes nowhere, mirroring the builds'
  * null-vector drop).
  */
case class NearestShards(child: Expression, groups: Int, dim: Int, p: Int,
                         centroids: Array[Float], offsets: Array[Int],
                         shards: Array[Int])
  extends UnaryExpression with ExpectsInputTypes {

  require(groups > 0 && dim > 0 && p > 0)
  require(centroids.length == groups * dim, "centroid layout mismatch")
  require(offsets.length == groups + 1 && offsets.last == shards.length,
    "group offset layout mismatch")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_shards"

  private def pp: Int = math.min(p, groups)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    // a null ELEMENT would route on a 0-substituted slot — treat it like
    // a wrong-dimension array (null ⇒ the query is dropped), matching
    // QintPairReduction's null-element semantics
    var nj = 0
    while (nj < dim) {
      if (v.isNullAt(nj)) return null
      nj += 1
    }
    val d = new Array[Double](groups)
    var g = 0
    while (g < groups) {
      var s = 0.0
      var j = 0
      val off = g * dim
      while (j < dim) {
        val diff = v.getFloat(j).toDouble - centroids(off + j)
        s += diff * diff
        j += 1
      }
      d(g) = s
      g += 1
    }
    // partial selection over group indices: top-pp by (dist, index) —
    // index order IS min-shard-id order by construction
    val sel = new Array[Int](pp)
    val taken = new Array[Boolean](groups)
    var t = 0
    while (t < pp) {
      var best = -1
      var g2 = 0
      while (g2 < groups) {
        if (!taken(g2) && (best < 0 || d(g2) < d(best))) best = g2
        g2 += 1
      }
      taken(best) = true
      sel(t) = best
      t += 1
    }
    var total = 0
    t = 0
    while (t < pp) { total += offsets(sel(t) + 1) - offsets(sel(t)); t += 1 }
    val out = new Array[Int](total)
    var w = 0
    t = 0
    while (t < pp) {
      var i = offsets(sel(t))
      while (i < offsets(sel(t) + 1)) { out(w) = shards(i); w += 1; i += 1 }
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("routeCentroids", centroids, "float[]")
    val offs = ctx.addReferenceObj("routeOffsets", offsets, "int[]")
    val shrd = ctx.addReferenceObj("routeShards", shards, "int[]")
    nullSafeCodeGen(ctx, ev, v => {
      val d = ctx.freshName("d")
      val g = ctx.freshName("g")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val diff = ctx.freshName("diff")
      val off = ctx.freshName("off")
      val sel = ctx.freshName("sel")
      val taken = ctx.freshName("taken")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val total = ctx.freshName("total")
      val out = ctx.freshName("out")
      val w = ctx.freshName("w")
      val i = ctx.freshName("i")
      val hasNull = ctx.freshName("hasNull")
      val nj = ctx.freshName("nj")
      s"""
        boolean $hasNull = false;
        if ($v.numElements() == $dim) {
          for (int $nj = 0; $nj < $dim; $nj++) {
            if ($v.isNullAt($nj)) { $hasNull = true; break; }
          }
        }
        if ($v.numElements() != $dim || $hasNull) {
          ${ev.isNull} = true;
        } else {
          double[] $d = new double[$groups];
          for (int $g = 0; $g < $groups; $g++) {
            double $s = 0.0;
            int $off = $g * $dim;
            for (int $j = 0; $j < $dim; $j++) {
              double $diff = (double) $v.getFloat($j)
                - (double) $cents[$off + $j];
              $s += $diff * $diff;
            }
            $d[$g] = $s;
          }
          int[] $sel = new int[$pp];
          boolean[] $taken = new boolean[$groups];
          for (int $t = 0; $t < $pp; $t++) {
            int $best = -1;
            for (int $g = 0; $g < $groups; $g++) {
              if (!$taken[$g] && ($best < 0 || $d[$g] < $d[$best])) $best = $g;
            }
            $taken[$best] = true;
            $sel[$t] = $best;
          }
          int $total = 0;
          for (int $t = 0; $t < $pp; $t++) {
            $total += $offs[$sel[$t] + 1] - $offs[$sel[$t]];
          }
          int[] $out = new int[$total];
          int $w = 0;
          for (int $t = 0; $t < $pp; $t++) {
            for (int $i = $offs[$sel[$t]]; $i < $offs[$sel[$t] + 1]; $i++) {
              $out[$w++] = $shrd[$i];
            }
          }
          ${ev.value} =
            new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric distance computation: approximate squared-L2 of a PQ-coded
  * vector to the query = Σ over subspaces of the precomputed
  * (query-subvector → centroid) distance `table[m][k]`, flattened. One
  * table lookup + add per subspace per row — the classic ADC inner loop,
  * codegen'd. Null / malformed codes → null score (ranks last).
  */
case class PqAdc(child: Expression, m: Int, k: Int, table: Array[Double])
  extends UnaryExpression with ExpectsInputTypes {

  require(table.length == m * k, "ADC table layout mismatch")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    if (codes.numElements() != m) null
    else {
      var s = 0.0
      var mi = 0
      var ok = true
      while (mi < m && ok) {
        val c = codes.getInt(mi)
        if (c < 0 || c >= k) ok = false
        else { s += table(mi * k + c); mi += 1 }
      }
      if (ok) s else null
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("adcTable", table, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val mi = ctx.freshName("mi")
      val code = ctx.freshName("code")
      val ok = ctx.freshName("ok")
      s"""
        if ($c.numElements() != $m) {
          ${ev.isNull} = true;
        } else {
          double $s = 0.0;
          boolean $ok = true;
          for (int $mi = 0; $mi < $m && $ok; $mi++) {
            int $code = $c.getInt($mi);
            if ($code < 0 || $code >= $k) { $ok = false; }
            else { $s += $tbl[$mi * $k + $code]; }
          }
          if ($ok) { ${ev.value} = $s; } else { ${ev.isNull} = true; }
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Batched ADC: like [[PqAdc]] but with one table per query, flattened
  * `[query][m][k]`, and the row's dense query index supplied as the second
  * child — so a broadcast-joined (row × query-batch) scan scores every
  * pair with ONE codegen'd lookup loop instead of one expression per
  * query. The tables blob (|queries|·m·k doubles, driver-computed) rides
  * the plan as a reference object. Null / malformed codes or an
  * out-of-range query index → null score (ranks last).
  */
case class PqAdcBatch(left: Expression, right: Expression, m: Int, k: Int,
                      tables: Array[Double])
  extends BinaryExpression with ExpectsInputTypes {

  require(tables.length % (m * k) == 0, "ADC tables layout mismatch")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), IntegerType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc_batch"

  private def nQueries: Int = tables.length / (m * k)

  override protected def nullSafeEval(codesAny: Any, qidxAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val q = qidxAny.asInstanceOf[Int]
    if (codes.numElements() != m || q < 0 || q >= nQueries) null
    else {
      val base = q * m * k
      var s = 0.0
      var mi = 0
      var ok = true
      while (mi < m && ok) {
        val c = codes.getInt(mi)
        if (c < 0 || c >= k) ok = false
        else { s += tables(base + mi * k + c); mi += 1 }
      }
      if (ok) s else null
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("adcTables", tables, "double[]")
    val nq = nQueries
    nullSafeCodeGen(ctx, ev, (c, q) => {
      val s = ctx.freshName("s")
      val mi = ctx.freshName("mi")
      val code = ctx.freshName("code")
      val ok = ctx.freshName("ok")
      val base = ctx.freshName("base")
      s"""
        if ($c.numElements() != $m || $q < 0 || $q >= $nq) {
          ${ev.isNull} = true;
        } else {
          int $base = $q * $m * $k;
          double $s = 0.0;
          boolean $ok = true;
          for (int $mi = 0; $mi < $m && $ok; $mi++) {
            int $code = $c.getInt($mi);
            if ($code < 0 || $code >= $k) { $ok = false; }
            else { $s += $tbl[$base + $mi * $k + $code]; }
          }
          if ($ok) { ${ev.value} = $s; } else { ${ev.isNull} = true; }
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object QintPairReduction {
  /** HALF_UP round of `v` to a long — BIT-IDENTICAL to Spark's
    * `round(cast(x as double) * 1e7).cast("long")` on finite inputs:
    * Spark's Round applies BigDecimal HALF_UP to the double's SHORTEST
    * DECIMAL representation, but every tie boundary `n + 0.5`
    * (n < 2^52) is itself exactly representable as a double, so a
    * value's side-of-tie can never differ between its binary form and
    * its shortest decimal form — decimal-HALF_UP ≡ binary-HALF_UP
    * (away from zero on exact ties, floor/ceil of v±0.5 otherwise).
    * NaN → 0 and ±Infinity saturate (Java's double→long conversion);
    * non-finite elements are OUTSIDE the oracle contract (embeddings
    * are finite by data contract) — the spec pins equivalence with the
    * HOF form over finite values, ties, negatives, and nulls.
    */
  @inline def halfUp(v: Double): Long =
    (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong

  /** Java statements assigning `halfUp(x * 1e7)` to long `target`
    * (`tmp` names the scratch double — must be unique per call site).
    */
  def halfUpJava(target: String, tmp: String, x: String): String =
    s"double $tmp = ((double) $x) * 1.0E7; " +
      s"long $target = (long) ($tmp >= 0 ? Math.floor($tmp + 0.5) " +
      s": Math.ceil($tmp - 0.5));"
}

/** Exact scaled-int64 pairwise reductions — the codegen'd form of the
  * oracle-determinism kernels (`VectorFunctions.dotScaled`/
  * `l2SqScaled`): quantize each element onto the 1e-7 grid with
  * [[QintPairReduction.halfUp]], combine, accumulate in int64. The
  * HOF formulation these replace (`aggregate(zip_with(transform...)))`)
  * evaluates an interpreted expression tree per element with boxing
  * and three array allocations per row — measured 50 µs/row on 64-dim
  * pairs (q132's 10^6-pair audit spent 49 s there); this is one
  * primitive loop inside whole-stage codegen. Null propagation matches
  * the HOF chain exactly: a length mismatch or ANY null element →
  * null result. The HOF twins stay in VectorFunctions, equivalence
  * spec-pinned (NativeExpressionsSpec).
  */
abstract class QintPairReduction extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  protected def combineScala(qx: Long, qy: Long): Long
  protected def combineJava(acc: String, qx: String, qy: String): String

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0L
      var j = 0
      while (j < n) {
        if (x.isNullAt(j) || y.isNullAt(j)) return null
        acc += combineScala(
          QintPairReduction.halfUp(x.getFloat(j).toDouble * 1e7),
          QintPairReduction.halfUp(y.getFloat(j).toDouble * 1e7))
        j += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val qx = ctx.freshName("qx")
      val qy = ctx.freshName("qy")
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      val bad = ctx.freshName("bad")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          long $acc = 0L;
          boolean $bad = false;
          for (int $j = 0; $j < $n && !$bad; $j++) {
            if ($a.isNullAt($j) || $b.isNullAt($j)) { $bad = true; }
            else {
              ${QintPairReduction.halfUpJava(qx, sx, s"$a.getFloat($j)")}
              ${QintPairReduction.halfUpJava(qy, sy, s"$b.getFloat($j)")}
              ${combineJava(acc, qx, qy)}
            }
          }
          if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
        }
      """
    })
}

/** Exact int64-grid dot product (`Σ q(x)·q(y)`), codegen'd. */
case class QintDot(left: Expression, right: Expression)
  extends QintPairReduction {
  override def prettyName: String = "graft_qint_dot"
  override protected def combineScala(qx: Long, qy: Long): Long = qx * qy
  override protected def combineJava(acc: String, qx: String,
                                     qy: String): String =
    s"$acc += $qx * $qy;"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Exact int64-grid squared L2 (`Σ (q(x)−q(y))²`), codegen'd. */
case class QintL2Sq(left: Expression, right: Expression)
  extends QintPairReduction {
  override def prettyName: String = "graft_qint_l2sq"
  override protected def combineScala(qx: Long, qy: Long): Long = {
    val d = qx - qy; d * d
  }
  override protected def combineJava(acc: String, qx: String,
                                     qy: String): String =
    s"{ long _d = $qx - $qy; $acc += _d * _d; }"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Dot of two ALREADY-quantized int64 arrays (the per-pair kernel of
  * the embedding near-dup family, which quantizes each row once and
  * scores O(n²) bounded-bucket pairs) — same null/length semantics as
  * [[QintPairReduction]], one codegen'd loop per pair.
  */
case class DotQL(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_ql"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0L
      var j = 0
      while (j < n) {
        if (x.isNullAt(j) || y.isNullAt(j)) return null
        acc += x.getLong(j) * y.getLong(j)
        j += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          long $acc = 0L;
          boolean $bad = false;
          for (int $j = 0; $j < $n && !$bad; $j++) {
            if ($a.isNullAt($j) || $b.isNullAt($j)) { $bad = true; }
            else { $acc += $a.getLong($j) * $b.getLong($j); }
          }
          if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Dot product of two float arrays as a codegen'd primitive loop. */
case class DotF(left: Expression, right: Expression) extends FloatPairReduction {
  override def prettyName: String = "graft_dot_f"
  override protected def combineJava(acc: String, x: String, y: String): String =
    s"$acc += ((double) $x) * ((double) $y);"
  override protected def combineScala(x: Float, y: Float): Double =
    x.toDouble * y.toDouble
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Squared L2 distance of two float arrays, codegen'd. */
case class L2SqF(left: Expression, right: Expression) extends FloatPairReduction {
  override def prettyName: String = "graft_l2sq_f"
  override protected def combineJava(acc: String, x: String, y: String): String =
    s"{ double d = ((double) $x) - ((double) $y); $acc += d * d; }"
  override protected def combineScala(x: Float, y: Float): Double = {
    val d = x.toDouble - y.toDouble; d * d
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
