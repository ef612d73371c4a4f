package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation — part of
  * the LLM-pipeline layer (the reference has no sampling surface; its
  * closest analogue is positional slicing, dataset.py:305-381).
  *
  * Both operators are REPRODUCIBLE across engines and runs — a curation
  * decision ("this row is in the training set") must be recomputable by
  * any system reading the same data, which rules out `rand(seed)` (RNG
  * stream is engine- and partitioning-specific). Selection is a pure
  * function of the row's key via md5, so the sampled set is stable under
  * repartitioning, retries, and engine swaps.
  */
object Sampling {

  /** Uniform in [0, 2^60) derived from the key's md5 — the engine-
    * independent coin for [[deterministicSample]].
    */
  def hashCoin(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 15),
      16, 10).cast("long")

  /** Keep ~`fraction` of rows: those whose md5-coin falls below the
    * cutoff. One codegen'd filter at the scan stage — no shuffle, no
    * state; `salt` yields independent samples from the same corpus
    * (train/validation splits via disjoint salts + fractions).
    */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
                          salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"bad fraction $fraction")
    val cutoff = (fraction * (1L << 60).toDouble).toLong
    df.filter(hashCoin(col(idCol), salt) < lit(cutoff))
  }

  /** Per-group quota: keep at most `n` rows per `groupCol`, chosen by the
    * (orderCol, idCol) total order — the "at most N docs per domain"
    * cap every crawl-curation pipeline applies. One hash shuffle on the
    * group key + per-partition sort; at scale a skewed group costs one
    * task's sort, never a cross-partition blow-up (row_number needs no
    * global sort).
    */
  def quotaPerGroup(df: DataFrame, groupCol: String, orderCol: String,
                    idCol: String, n: Int): DataFrame = {
    require(n > 0, s"bad quota $n")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).asc, col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }

  /** Sequence packing for training: assign every document a `(stream,
    * block, block_offset)` address in the concatenate-and-chop layout
    * LLM pretraining uses — documents are concatenated in a
    * deterministic order and the token stream is chopped into
    * fixed-`budget` context blocks; a document's `block` is where its
    * FIRST token lands (a doc longer than the remaining block space
    * overflows into subsequent blocks, exactly like the real packer).
    * `tokens` is the per-row token count (any expression — whitespace
    * count, a BPE estimate, a precomputed column).
    *
    * Deterministic and engine-replayable like everything in this file:
    * the stream id and the intra-stream order both derive from the md5
    * coin, so the layout is a pure function of (row ids, token counts)
    * — stable under repartitioning, retries, and engine swaps, which is
    * what lets a downstream trainer and this engine agree on sample
    * boundaries without shipping an index.
    *
    * Scale: one hash shuffle on the stream id + a per-stream
    * running-sum window — no global sort, no driver state. Pick
    * `streams` so one stream's rows fit a task's sort (the window sorts
    * (coin, id, tokens) triples, not document bodies; project narrow
    * before packing a wide table). The md5 coin is uniform, so streams
    * are balanced by construction.
    */
  def packByBudget(df: DataFrame, idCol: String, tokens: Column,
                   budget: Long, streams: Int,
                   salt: String = ""): DataFrame = {
    require(budget > 0, s"bad budget $budget")
    require(streams > 0, s"bad stream count $streams")
    // ROWS, not the default RANGE frame: RANGE sums ALL peers of the
    // current (coin, id) order key, so a duplicated id would double-count
    // its ties and silently break the engine-replayable layout. With
    // unique ids the frames agree; ROWS makes the running sum positional
    // unconditionally.
    val w = Window.partitionBy(col("_stream"))
      .orderBy(col("_coin").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_coin", hashCoin(col(idCol), salt))
      .withColumn("_stream", pmod(col("_coin"), lit(streams.toLong)))
      .withColumn("_ntok", tokens.cast("long"))
      .withColumn("_start", sum(col("_ntok")).over(w) - col("_ntok"))
      .withColumn("stream", col("_stream"))
      .withColumn("block",
        floor(col("_start") / lit(budget.toDouble)).cast("long"))
      .withColumn("block_offset", pmod(col("_start"), lit(budget)))
      .drop("_coin", "_stream", "_ntok", "_start")
  }

  /** Mixture sampling: downsample each source so the kept corpus
    * approaches the target `weights` WITHOUT upsampling — the "data
    * mixture" step of pretraining curation. Per-source keep rate is
    * `(w_s / n_s)` normalized so the most over-weighted source keeps
    * everything (rates are relative: doubling every weight changes
    * nothing); rows are chosen by the salted md5 coin, so the kept set
    * is engine-independent and stable under repartitioning. Sources
    * missing from `weights` are dropped; weights naming absent sources
    * are ignored.
    *
    * Scale: the per-source counts are a map-side-combined aggregate
    * (the shuffle moves partial counts, never corpus rows) INNER-JOINED
    * to the caller's weights before anything reaches the driver — so
    * the collect is bounded by `weights.size`, a map the caller already
    * holds in driver memory, even when `sourceCol` itself has unbounded
    * cardinality (a domain column: unweighted domains never survive the
    * join). One aggregation pass total; the cutoffs then ride a
    * BROADCAST local table into one codegen'd filter at the scan — the
    * corpus itself never shuffles. The source key is compared AS STRING
    * (weights are string-keyed), so non-string source columns work;
    * null-source rows are dropped like any unweighted source.
    */
  def mixBySource(df: DataFrame, idCol: String, sourceCol: String,
                  weights: Map[String, Double],
                  salt: String = ""): DataFrame = {
    require(weights.nonEmpty, "empty weights")
    require(weights.values.forall(w => w > 0 && !w.isInfinite && !w.isNaN),
      s"weights must be finite and positive: $weights")
    val spark = df.sparkSession
    import spark.implicits._
    val wDf = broadcast(weights.toSeq.toDF("_mix_src", "_mix_w"))
    // ≤ weights.size rows by construction (inner join on the weight keys)
    val ratios = df
      .select(col(sourceCol).cast("string").as("_mix_src"))
      .filter(col("_mix_src").isNotNull)
      .groupBy("_mix_src").count()
      .join(wDf, "_mix_src")
      .select(col("_mix_src"),
        (col("_mix_w") / col("count").cast("double")).as("_mix_ratio"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    require(ratios.nonEmpty, "no weighted source present in the data")
    val maxRatio = ratios.map(_._2).max
    val cutDf = ratios.toSeq.map { case (s, r) =>
      (s, ((r / maxRatio) * (1L << 60).toDouble).toLong) }
      .toDF("_mix_src", "_mix_cutoff")
    df.join(broadcast(cutDf), col(sourceCol).cast("string") === col("_mix_src"))
      .filter(hashCoin(col(idCol), salt) < col("_mix_cutoff"))
      .drop("_mix_src", "_mix_cutoff")
  }
}
