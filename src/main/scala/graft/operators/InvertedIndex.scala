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

  /** Ids of docs containing ALL whitespace tokens of `query`
    * (reference fuzzy_match).
    */
  def fuzzyMatchIds(index: DataFrame, query: String): DataFrame = {
    val toks = query.trim.split("\\s+").toSeq.distinct.filter(_.nonEmpty)
    require(toks.nonEmpty, "empty query")
    index.filter(col("term").isin(toks: _*))
      .groupBy("id")
      .agg(countDistinct("term").as("_nt"))
      .filter(col("_nt") === toks.length)
      .select("id")
  }

  /** Ids for `"a b||c"` = (a AND b) OR (c) (reference complex_fuzzy_match). */
  def complexFuzzyIds(index: DataFrame, query: String): DataFrame =
    query.split("\\|\\|").toSeq.map(_.trim).filter(_.nonEmpty)
      .map(fuzzyMatchIds(index, _))
      .reduce(_ union _)
      .distinct()

  /** Semi-join the corpus down to the docs matching a fuzzy query, routed
    * through the posting table (the indexed CONTAINS path of
    * filter_vectorized — filter_vectorized.py:303-380).
    */
  def search(df: DataFrame, idCol: String, index: DataFrame,
             query: String): DataFrame = {
    val ids = complexFuzzyIds(index, query)
    df.join(broadcast(ids.withColumnRenamed("id", idCol)), Seq(idCol), "left_semi")
  }
}
