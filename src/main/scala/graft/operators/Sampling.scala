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
}
