package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed, co-located joins — the shuffle-elimination tool for the
  * recurring big-fact ⋈ big-fact joins of a 100 TB deployment (SURVEY.md
  * §7.2 M4 "100 TB posture"). Two tables bucketed by the same key into
  * the same bucket count join WITHOUT an Exchange on either side: the
  * shuffle is paid once at write time and amortized over every
  * subsequent join/aggregation on that key.
  *
  * (The reference is single-node and has no notion of this; it is part
  * of the scale layer this engine adds.)
  */
object Bucketing {

  /** Persist `df` as a bucketed (and in-bucket sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
                    keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "need at least one bucket key")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two co-bucketed tables on their bucket keys — planner emits a
    * SortMergeJoin with NO shuffle exchange when bucket specs line up.
    */
  def cobucketedJoin(spark: SparkSession, left: String, right: String,
                     keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
