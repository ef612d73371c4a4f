package graft.functions

import org.apache.spark.sql.Column

/** Public alias for the native codegen'd expressions (which live under
  * `org.apache.spark.sql.graftnative` to reach `private[sql]` APIs).
  */
object NativeExpressions {
  import org.apache.spark.sql.graftnative.{NativeExpressions => N}
  def minHashSig(shingles: Column, numHashes: Int): Column =
    N.minHashSig(shingles, numHashes)
  def minHashBands(sig: Column, rowsPerBand: Int): Column =
    N.minHashBands(sig, rowsPerBand)
  def rpLshBands(vec: Column, planesPerBand: Int, bands: Int): Column =
    N.rpLshBands(vec, planesPerBand, bands)
  def simHash32(tokens: Column): Column = N.simHash32(tokens)
  def simHash60Md5(tokens: Column): Column = N.simHash60Md5(tokens)
  def pqEncode(vec: Column, m: Int, k: Int, subDim: Int,
               codebooks: Array[Float]): Column =
    N.pqEncode(vec, m, k, subDim, codebooks)
  def nearestCell(vec: Column, nlist: Int, dim: Int,
                  centroids: Array[Float]): Column =
    N.nearestCell(vec, nlist, dim, centroids)
  def nearestShards(vec: Column, groups: Int, dim: Int, p: Int,
                    centroids: Array[Float], offsets: Array[Int],
                    shards: Array[Int]): Column =
    N.nearestShards(vec, groups, dim, p, centroids, offsets, shards)
  def pqAdc(codes: Column, m: Int, k: Int, table: Array[Double]): Column =
    N.pqAdc(codes, m, k, table)
  def pqAdcBatch(codes: Column, qidx: Column, m: Int, k: Int,
                 tables: Array[Double]): Column =
    N.pqAdcBatch(codes, qidx, m, k, tables)
  def dotF(a: Column, b: Column): Column = N.dotF(a, b)
  def l2SqF(a: Column, b: Column): Column = N.l2SqF(a, b)
  def dotScaledQ(a: Column, b: Column): Column = N.dotScaledQ(a, b)
  def l2SqScaledQ(a: Column, b: Column): Column = N.l2SqScaledQ(a, b)
  def dotQL(a: Column, b: Column): Column = N.dotQL(a, b)
  def topKPairs(score: Column, id: Column, k: Int, asc: Boolean): Column =
    org.apache.spark.sql.graftnative.TopKAggregate
      .topKPairs(score, id, k, asc)

  /** Single-evaluation pin for an expensive derived column (guide §4.4):
    * a deterministic pass-through the optimizer treats as
    * non-deterministic, so filters referencing the column stay above its
    * projection (no pushdown re-evaluation below a repartition) and
    * CollapseProject cannot inline the definition into every use site.
    */
  def fence(c: Column): Column = N.fence(c)
}
