package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Deduplication operators for training-data pipelines, all expressed as
  * shuffling DataFrame jobs (no driver-side materialization → scale to any
  * corpus size; the shuffles are keyed on hashes/bands so they distribute
  * evenly).
  *
  * Families: exact (hash groupBy), MinHash+LSH near-dup, SimHash, n-gram
  * Jaccard, embedding-cosine near-dup. The reference engine has none of
  * these (its only dedup-adjacent op is `np.unique` inside aggregation —
  * muller/core/query/aggregate_vectorized.py:53-54); they are the
  * beyond-parity LLM-pipeline layer this engine adds.
  */
object Dedup {

  // ---- exact ------------------------------------------------------------

  /** Exact dedup on normalized text: keeps the lowest-id row per
    * fingerprint. One hash-shuffle; at 100 TB this is the cheapest possible
    * dedup (map-side partial min per fingerprint).
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("_fp", T.fingerprintMd5(col(textCol)))
      .groupBy(col("_fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  // ---- MinHash + LSH ----------------------------------------------------

  /** One MinHash value: min over token shingles of a seeded 32-bit hash.
    * `hash(shingle, seed)` is Spark's murmur3 — evaluated per element with
    * no UDF.
    */
  private def minHash(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, s => hash(s, lit(seed))))

  /** MinHash signature as `numHashes` columns `mh_0..mh_{k-1}` over token
    * `n`-gram shingles.
    */
  def minHashSignature(df: DataFrame, textCol: String,
                       numHashes: Int, shingleN: Int): DataFrame = {
    val withSh = df.withColumn("_sh", T.tokenShingles(col(textCol), shingleN))
      .filter(size(col("_sh")) > 0)
    (0 until numHashes).foldLeft(withSh) { (d, i) =>
      d.withColumn(s"mh_$i", minHash(col("_sh"), i))
    }.drop("_sh")
  }

  /** LSH banding: group the signature into `bands` bands of `rowsPerBand`
    * hashes; two docs sharing ANY band bucket become a candidate pair.
    * Returns candidate pairs (idCol_a < idCol_b), deduplicated.
    *
    * Scale shape: explode-to-bands (rows × bands), shuffle on
    * (band, bucket-hash), self-join WITHIN buckets only — never a full
    * cross join. Skew guard: buckets larger than `maxBucket` are dropped
    * (they are degenerate near-identical floods; flagged for a separate
    * exact pass).
    */
  def lshCandidates(sig: DataFrame, idCol: String, numHashes: Int,
                    bands: Int, maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh_$i"))
      struct(lit(b).as("band"), hash(cols: _*).as("bucket"))
    }
    val buckets = sig
      .withColumn("_bb", explode(array(bandCols: _*)))
      .select(col(idCol), col("_bb.band").as("band"), col("_bb.bucket").as("bucket"))
    val small = buckets
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .filter(col("_n") <= maxBucket)
      .drop("_n")
    small.as("a").join(small.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as(s"${idCol}_a"), col(s"b.$idCol").as(s"${idCol}_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup: candidates verified by exact Jaccard over
    * the same shingle sets, keeping pairs with similarity >= threshold.
    */
  def minHashLsh(df: DataFrame, textCol: String, idCol: String,
                 numHashes: Int = 32, bands: Int = 8, shingleN: Int = 3,
                 threshold: Double = 0.7): DataFrame = {
    val sig = minHashSignature(df, textCol, numHashes, shingleN)
    val cand = lshCandidates(sig, idCol, numHashes, bands)
    val sh = df.select(col(idCol), T.tokenShingles(col(textCol), shingleN).as("_sh"))
    cand
      .join(sh.withColumnRenamed(idCol, s"${idCol}_a").withColumnRenamed("_sh", "_sa"), s"${idCol}_a")
      .join(sh.withColumnRenamed(idCol, s"${idCol}_b").withColumnRenamed("_sh", "_sb"), s"${idCol}_b")
      .withColumn("jaccard",
        size(array_intersect(col("_sa"), col("_sb"))).cast("double") /
          size(array_union(col("_sa"), col("_sb"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(s"${idCol}_a", s"${idCol}_b", "jaccard")
  }

  // ---- exact n-gram Jaccard (the oracle-checkable near-dup path) --------

  /** Exact pairwise n-gram Jaccard over explode + shuffle-join on shingle:
    * candidate pairs are docs sharing >= 1 shingle (optionally restricted
    * to a `blockCol` like source/bucket to bound the join), exact
    * similarity from intersection counts + per-doc distinct-shingle counts.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        shingleN: Int, threshold: Double,
                        blockCol: Option[String] = None): DataFrame = {
    val base = df.select(
      (Seq(col(idCol)) ++ blockCol.map(col)) :+
        T.tokenShingles(col(textCol), shingleN).as("_sh"): _*)
    val counts = base.select(col(idCol).as("_id"), size(col("_sh")).as("_cnt"))
    val ex = base.select(
      (Seq(col(idCol)) ++ blockCol.map(col)) :+ explode(col("_sh")).as("_s"): _*)
    val joinCond = blockCol.map(bc => col(s"a.$bc") === col(s"b.$bc"))
      .foldLeft(col(s"a.$idCol") < col(s"b.$idCol") && col("a._s") === col("b._s"))(_ && _)
    ex.as("a").join(ex.as("b"), joinCond)
      .groupBy(col(s"a.$idCol").as(s"${idCol}_a"), col(s"b.$idCol").as(s"${idCol}_b"))
      .agg(count(lit(1)).as("_inter"))
      .join(counts.withColumnRenamed("_id", s"${idCol}_a").withColumnRenamed("_cnt", "_ca"), s"${idCol}_a")
      .join(counts.withColumnRenamed("_id", s"${idCol}_b").withColumnRenamed("_cnt", "_cb"), s"${idCol}_b")
      .withColumn("jaccard",
        col("_inter").cast("double") /
          (col("_ca") + col("_cb") - col("_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(s"${idCol}_a", s"${idCol}_b", "jaccard")
  }

  // ---- SimHash ----------------------------------------------------------

  /** 32-bit SimHash over tokens: per bit, sum +1/-1 weighted by token
    * presence; sign → bit. Hamming-close fingerprints = near-dups.
    * Pure expressions: tokens → murmur3 → per-bit vote via aggregate().
    */
  def simHash32(textCol: Column): Column = {
    val toks = T.tokens(textCol)
    // bit positions are unrolled at plan-build time (shift amounts must be
    // Scala ints); one aggregate pass, finish-lambda folds votes → bits
    aggregate(
      toks,
      array_repeat(lit(0), 32),
      (acc, t) => {
        val h = hash(t)
        val bits = array((0 until 32).map(i =>
          when(shiftright(h, i).bitwiseAND(lit(1)) === 1, lit(1))
            .otherwise(lit(-1))): _*)
        zip_with(acc, bits, (a, b) => a + b)
      },
      votes => (0 until 32).map(i =>
        when(element_at(votes, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ + _))
  }

  /** Hamming distance between two int64 fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ---- embedding cosine near-dup ----------------------------------------

  /** Near-duplicate pairs by embedding cosine similarity, blocked on
    * `blockCol` (e.g. an LSH bucket or label) so the self-join never goes
    * quadratic in the full corpus. Uses the exact scaled-int path so the
    * result is engine-deterministic.
    */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String,
                       blockCol: String, threshold: Double): DataFrame =
    df.as("a").join(df.as("b"),
        col(s"a.$blockCol") === col(s"b.$blockCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cos_sim", V.cosineScaled(col(s"a.$vecCol"), col(s"b.$vecCol")))
      .filter(col("cos_sim") >= threshold)
      .select(col(s"a.$idCol").as(s"${idCol}_a"),
        col(s"b.$idCol").as(s"${idCol}_b"), col("cos_sim"))
}
