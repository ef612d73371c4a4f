package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Inverted text index as posting-list Parquet tables — the Spark-native
  * re-design of MULLER's sharded inverted index
  * (reference: muller/core/query/inverted_index_vectorized.py — build
  * :206-310, sharding by term hash :168-180, fuzzy_match = intersection of
  * per-token postings :1219-1223, complex "a||b" OR-of-conjunctions
  * :141-158, exact_match :1017-1019, range_match :1230-1239).
  *
  * Design (SURVEY.md §2.6): one build job
  * `explode(distinct tokens) → (term, id)` written PARTITIONED BY shard
  * (= hash(term) % numShards). A term lookup prunes to one shard partition
  * (same effect as the reference's shard-file routing, but via Parquet
  * partition pruning). Search = semi-joins of posting lists:
  *   fuzzy_match(q)  = docs containing ALL tokens of q
  *                   = groupBy(id) HAVING count(distinct term) = |q|
  *   complex(q1||q2) = union of the conjunctive sets.
  * The posting side of the join is tiny relative to the corpus → broadcast.
  *
  * At 100 TB: the index build is a single shuffle on term; incremental
  * maintenance appends postings for new commits only (the reference's
  * update_index :397-445 ≡ building the index of the appended slice and
  * unioning the parquet partitions).
  */
object InvertedIndex {

  /** Posting table for a text column: (term, shard, id). */
  def build(df: DataFrame, textCol: String, idCol: String,
            numShards: Int = 16): DataFrame =
    df.select(col(idCol).as("id"),
        explode(array_distinct(T.tokens(col(textCol)))).as("term"))
      .withColumn("shard", pmod(xxhash64(col("term")), lit(numShards)).cast("int"))

  def save(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").partitionBy("shard").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Shard of a term — MUST match the build-side expression
    * `pmod(xxhash64(term), numShards)` so query-time shard routing prunes
    * to the same partitions the build wrote.
    */
  def shardOf(term: String, numShards: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(term),
      org.apache.spark.sql.types.StringType, 42L)
    java.lang.Math.floorMod(h, numShards.toLong).toInt
  }

  /** Ids of docs containing ALL whitespace tokens of `query`
    * (reference fuzzy_match). When `numShards` is known (persisted index),
    * the query tokens' shards are computed driver-side and added to the
    * filter — on a shard-partitioned posting table that is PARTITION
    * PRUNING: only |distinct shards of query terms| partitions are read,
    * the Spark equivalent of the reference's shard-file routing
    * (inverted_index_vectorized.py:1012-1036).
    */
  def fuzzyMatchIds(index: DataFrame, query: String,
                    numShards: Option[Int] = None): DataFrame = {
    val toks = query.trim.split("\\s+").toSeq.distinct.filter(_.nonEmpty)
    require(toks.nonEmpty, "empty query")
    val base = numShards match {
      case Some(n) =>
        val shards = toks.map(shardOf(_, n)).distinct
        index.filter(col("shard").isin(shards: _*) &&
          col("term").isin(toks: _*))
      case None => index.filter(col("term").isin(toks: _*))
    }
    base.groupBy("id")
      .agg(countDistinct("term").as("_nt"))
      .filter(col("_nt") === toks.length)
      .select("id")
  }

  /** Ids for `"a b||c"` = (a AND b) OR (c) (reference complex_fuzzy_match). */
  def complexFuzzyIds(index: DataFrame, query: String,
                      numShards: Option[Int] = None): DataFrame =
    query.split("\\|\\|").toSeq.map(_.trim).filter(_.nonEmpty)
      .map(fuzzyMatchIds(index, _, numShards))
      .reduce(_ union _)
      .distinct()

  /** All distinct tokens across the OR-alternatives of a complex query. */
  def queryTokens(query: String): Seq[String] =
    query.split("\\|\\|").toSeq.map(_.trim).filter(_.nonEmpty)
      .flatMap(_.split("\\s+").toSeq.filter(_.nonEmpty)).distinct

  /** Upper bound on the matching-id count: total posting rows for the
    * query's tokens. A shard-pruned, predicate-pushed columnar count —
    * cheap even on a huge index — and the conjunctive/distinct id set can
    * only be smaller.
    */
  def postingBound(index: DataFrame, query: String,
                   numShards: Option[Int] = None): Long = {
    val toks = queryTokens(query)
    val base = numShards match {
      case Some(n) =>
        val shards = toks.map(shardOf(_, n)).distinct
        index.filter(col("shard").isin(shards: _*) &&
          col("term").isin(toks: _*))
      case None => index.filter(col("term").isin(toks: _*))
    }
    base.count()
  }

  /** Default cap on posting-id sets we force-broadcast: ~4M ids ≈ 32 MB
    * of longs — comfortably under executor broadcast budgets. Common
    * terms on a huge corpus blow far past this; forcing their id sets
    * through the driver would OOM it, so they fall back to a shuffle
    * semi-join (or whatever AQE picks at runtime).
    */
  val defaultBroadcastIdLimit: Long = 4L * 1000 * 1000

  /** Semi-join the corpus down to the docs matching a fuzzy query, routed
    * through the posting table (the indexed CONTAINS path of
    * filter_vectorized — filter_vectorized.py:303-380). The broadcast is
    * GUARDED by a posting-count bound: only id sets provably small enough
    * get the hint; above the cap the join is left unhinted for AQE.
    */
  def search(df: DataFrame, idCol: String, index: DataFrame,
             query: String, numShards: Option[Int] = None,
             broadcastIdLimit: Long = defaultBroadcastIdLimit): DataFrame = {
    val ids = complexFuzzyIds(index, query, numShards)
      .withColumnRenamed("id", idCol)
    val rhs =
      if (postingBound(index, query, numShards) <= broadcastIdLimit)
        broadcast(ids)
      else ids
    df.join(rhs, Seq(idCol), "left_semi")
  }
}
