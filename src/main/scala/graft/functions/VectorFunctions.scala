package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distance / similarity primitives over `ArrayType(FloatType)` embedding
  * columns — the Spark-native replacement for MULLER's vector-search
  * metrics (reference: muller/core/vector/utils.py:25-95 — l2 / cosine /
  * inner_product on faiss).
  *
  * Two families:
  *   - **float path** (`dot`, `cosine`, `l2Sq`): plain double arithmetic via
  *     `zip_with` + `aggregate` higher-order functions — codegen-friendly,
  *     what production queries should use.
  *   - **scaled-int path** (`dotScaled`, `cosineScaled`, `l2SqScaled`):
  *     quantizes each float to a 1e-7-step int64 grid first, so every sum is
  *     exact int64 arithmetic — order-independent and bit-identical across
  *     engines. Used for oracle-checked correctness queries where a
  *     double-sum's non-associativity would break hash comparison.
  */
object VectorFunctions {

  /** Quantize a float array onto an int64 grid of step 1e-7. */
  def qint(c: Column): Column =
    transform(c, x => round(x.cast("double") * lit(1e7)).cast("long"))

  // ---- float path -------------------------------------------------------
  // Backed by native codegen'd expressions (NativeExpressions): Spark's
  // higher-order array functions evaluate interpreted per element, while
  // these compile to primitive loops inside whole-stage codegen.

  def dot(a: Column, b: Column): Column = NativeExpressions.dotF(a, b)

  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity; null when either vector is zero (undefined —
    * `try_divide` keeps the job alive under ANSI mode instead of
    * aborting on the first degenerate embedding).
    */
  def cosine(a: Column, b: Column): Column =
    try_divide(dot(a, b), sqrt(normSq(a)) * sqrt(normSq(b)))

  def l2Sq(a: Column, b: Column): Column = NativeExpressions.l2SqF(a, b)

  /** Unit-normalize a float vector (zero vectors pass through unchanged
    * rather than becoming Infinity/NaN). On unit vectors L2 order equals
    * cosine order (`‖a−b‖² = 2 − 2·cos`), which is how graph indexes
    * serve the cosine metric.
    */
  def normalize(a: Column): Column = {
    val n = sqrt(normSq(a))
    when(n === 0.0 || a.isNull, a)
      .otherwise(transform(a, x => (x / n).cast("float")))
  }

  // ---- exact scaled-int path (deterministic across engines) -------------
  // Backed by codegen'd native kernels since r19: the HOF formulation
  // evaluated an interpreted tree per element with three array
  // allocations per row — q132's 10^6-pair audit measured 50 µs/pair
  // there, ~100× the native loop. The HOF twins below remain the
  // equivalence oracles (NativeExpressionsSpec pins bit-identity on
  // finite values, exact .5 ties, negatives, nulls, and length
  // mismatches — the quantization is HALF_UP either way, see
  // QintPairReduction.halfUp's proof sketch).

  /** Exact dot product on the 1e-7 grid. 64 dims × (1e7)^2 ≈ 6.4e15 — fits
    * int64 with huge margin and converts to double losslessly (< 2^53).
    */
  def dotScaled(a: Column, b: Column): Column =
    NativeExpressions.dotScaledQ(a, b)

  /** Dot of two ALREADY-quantized int64 arrays. Pairwise operators should
    * quantize each row once (`qint`) and then use this per pair — for an
    * n-row block that is O(n) quantizations instead of O(n²).
    */
  def dotQ(a: Column, b: Column): Column = NativeExpressions.dotQL(a, b)

  def normSqScaled(a: Column): Column = dotScaled(a, a)

  /** Cosine from exact int64 dot/norms; the final double ops are IEEE-exact
    * on integer inputs → deterministic.
    */
  def cosineScaled(a: Column, b: Column): Column =
    try_divide(dotScaled(a, b).cast("double"),
      sqrt(normSqScaled(a).cast("double")) * sqrt(normSqScaled(b).cast("double")))

  def l2SqScaled(a: Column, b: Column): Column =
    NativeExpressions.l2SqScaledQ(a, b)

  // ---- HOF twins: the spec-pinned equivalence oracles for the native
  // scaled kernels (kept OUT of hot paths) ----

  private[graft] def dotScaledHof(a: Column, b: Column): Column =
    aggregate(zip_with(qint(a), qint(b), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)

  private[graft] def dotQHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  private[graft] def l2SqScaledHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(qint(a), qint(b), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
}
