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
/** Posting-count statistics persisted WITH the index at build time (the
  * Spark-native form of the reference's hot-term cache,
  * inverted_index_vectorized.py:526-574): exact counts for the `hotN` most
  * frequent terms, plus the (hotN+1)-th count as a safe upper bound for
  * every other term. Query-time broadcast decisions read this driver-side —
  * no Spark job during planning or search.
  */
case class IndexStats(hotTerms: Map[String, Long], maxOtherCount: Long,
                      docCount: Long = 0L, avgDocLen: Double = 0.0)

object InvertedIndex {

  /** Posting table for a text column: (term, shard, id). `tokenizer`
    * carries the reference's build options (jieba user dict, stop words,
    * case sensitivity — inverted_index_vectorized.py:121-158): pass
    * `T.tokensDict(_, dict, stopWords, caseSensitive)` for a CJK corpus;
    * the default is the whitespace contract the oracle queries share.
    */
  def build(df: DataFrame, textCol: String, idCol: String,
            numShards: Int = 16,
            tokenizer: org.apache.spark.sql.Column => org.apache.spark.sql.Column
              = T.tokens): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    df.select(col(idCol).as("id"),
        explode(array_distinct(tokenizer(col(textCol)))).as("term"))
      .withColumn("shard", pmod(xxhash64(col("term")), lit(numShards)).cast("int"))
  }

  /** Persist postings + the stats sidecar. The sidecar costs one
    * top-(hotN+1) aggregation at BUILD time (TakeOrderedAndProject —
    * per-partition top-k, driver merges hotN+1 rows) and saves a job on
    * every subsequent query.
    */
  def save(index: DataFrame, path: String): Unit = {
    index.write.mode("overwrite").partitionBy("shard").parquet(path)
    // stats from the WRITTEN postings, not the build lineage: the lineage
    // re-runs the corpus tokenize+explode twice more (computeStats is two
    // actions) where the written parquet is two cheap columnar scans —
    // and a non-deterministic source could diverge the persisted stats
    // from the persisted postings
    val spark = index.sparkSession
    saveStats(spark, path, computeStats(load(spark, path)))
  }

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Name starts with `_` so parquet directory listings ignore it. */
  val statsFileName = "_graft_stats.json"
  val defaultHotTerms = 1024

  /** Exact counts for the top `hotN` terms; the next count bounds the
    * rest. Also corpus-level ranking stats (doc count, average
    * distinct-token doc length) — one extra single-row aggregation at
    * build time so [[bm25Search]] never runs a corpus pass per query.
    */
  def computeStats(index: DataFrame, hotN: Int = defaultHotTerms): IndexStats = {
    val top = index.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(hotN + 1)
      .collect() // hotN+1 rows only — bounded by construction
    val (hot, rest) = top.splitAt(hotN)
    val g = index.agg(count(lit(1)).as("p"),
      countDistinct(col("id")).as("d")).head() // single row
    val (postings, docs) = (g.getLong(0), g.getLong(1))
    IndexStats(hot.map(r => r.getString(0) -> r.getLong(1)).toMap,
      rest.headOption.map(_.getLong(1)).getOrElse(0L),
      docCount = docs,
      avgDocLen = if (docs == 0) 0.0 else postings.toDouble / docs)
  }

  def saveStats(spark: SparkSession, postingsPath: String,
                stats: IndexStats): Unit = {
    val p = new org.apache.hadoop.fs.Path(postingsPath, statsFileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // temp + swap, never truncate-in-place: a concurrent loadStats
    // between create and close would read zero/partial JSON and fail the
    // query with a parse error; the delete+rename window instead reads
    // ABSENT, which loadStats already degrades on gracefully (statsless
    // query, no forced broadcast)
    val tmp = new org.apache.hadoop.fs.Path(postingsPath,
      s".$statsFileName.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    try out.write(org.json4s.jackson.Serialization.write(
      Map("maxOtherCount" -> stats.maxOtherCount,
        "docCount" -> stats.docCount, "avgDocLen" -> stats.avgDocLen) ++
        Map("hotTerms" -> stats.hotTerms))(org.json4s.DefaultFormats)
      .getBytes("UTF-8"))
    finally out.close()
    try {
      fs.delete(p, false)
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"stats sidecar swap failed: $p")
    } catch {
      case e: Throwable => scala.util.Try(fs.delete(tmp, false)); throw e
    }
    statsCache.remove(postingsPath)
  }

  // modtime-keyed driver-side cache: one namenode stat per query, zero jobs
  private val statsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, IndexStats)]()

  def loadStats(spark: SparkSession, postingsPath: String): Option[IndexStats] = {
    val p = new org.apache.hadoop.fs.Path(postingsPath, statsFileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val mod = fs.getFileStatus(p).getModificationTime
      val cached = statsCache.get(postingsPath)
      if (cached != null && cached._1 == mod) Some(cached._2)
      else {
        val in = fs.open(p)
        val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
        val j = org.json4s.jackson.JsonMethods.parse(s)
        val st = IndexStats(
          (j \ "hotTerms").extract[Map[String, Long]],
          (j \ "maxOtherCount").extract[Long],
          // older sidecars lack the ranking stats — default to 0
          (j \ "docCount").extractOpt[Long].getOrElse(0L),
          (j \ "avgDocLen").extractOpt[Double].getOrElse(0.0))
        statsCache.put(postingsPath, (mod, st))
        Some(st)
      }
    }
  }

  /** Upper bound on the matching-id count for a query, from stats alone:
    * sum of each token's hot count (or `maxOtherCount` for non-hot terms —
    * an overestimate, so the decision errs toward NOT force-broadcasting).
    * The conjunctive/distinct id set can only be smaller.
    */
  def statsBound(stats: IndexStats, query: String): Long =
    statsBound(stats, queryTokens(query))

  /** [[statsBound]] over pre-tokenized terms (a custom query tokenizer
    * must bound with ITS tokens, or the decision reads the wrong counts).
    */
  def statsBound(stats: IndexStats, toks: Seq[String]): Long =
    toks.map(t => stats.hotTerms.getOrElse(t, stats.maxOtherCount)).sum

  /** Shard of a term — MUST match the build-side expression
    * `pmod(xxhash64(term), numShards)` so query-time shard routing prunes
    * to the same partitions the build wrote.
    */
  def shardOf(term: String, numShards: Int): Int = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
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
                    numShards: Option[Int] = None,
                    queryTokenizer: Option[org.apache.spark.sql.Column =>
                      org.apache.spark.sql.Column] = None): DataFrame = {
    val toks = queryAlts(index.sparkSession, query, queryTokenizer)
      .flatten.distinct
    require(toks.nonEmpty, "empty query")
    matchIds(index, Seq(toks), numShards)
  }

  /** Ids for `"a b||c"` = (a AND b) OR (c) (reference complex_fuzzy_match). */
  def complexFuzzyIds(index: DataFrame, query: String,
                      numShards: Option[Int] = None,
                      queryTokenizer: Option[org.apache.spark.sql.Column =>
                        org.apache.spark.sql.Column] = None): DataFrame = {
    val alts = queryAlts(index.sparkSession, query, queryTokenizer)
    require(alts.nonEmpty, "empty query")
    matchIds(index, alts, numShards)
  }

  /** ONE aggregation for any OR-of-ANDs: filter postings to the union of
    * all query tokens (shard-pruned), collect each doc's matched-term set,
    * evaluate every conjunction against it. One shuffle total — the
    * per-alternative groupBy + union + distinct shape costs one shuffle
    * PER alternative and re-reads the postings each time.
    */
  /** Postings filtered to `toks`, shard-pruned when the count is known —
    * [[shardOf]] must mirror the build expression; ONE shared helper so
    * the fuzzy and BM25 paths can never drift apart on the routing.
    */
  private def prunedPostings(index: DataFrame, toks: Seq[String],
                             numShards: Option[Int]): DataFrame =
    numShards match {
      case Some(n) =>
        val shards = toks.map(shardOf(_, n)).distinct
        index.filter(col("shard").isin(shards: _*) &&
          col("term").isin(toks: _*))
      case None => index.filter(col("term").isin(toks: _*))
    }

  private def matchIds(index: DataFrame, alts: Seq[Seq[String]],
                       numShards: Option[Int]): DataFrame = {
    val toks = alts.flatten.distinct
    val base = prunedPostings(index, toks, numShards)
    base.groupBy("id").agg(collect_set("term").as("_ts"))
      .filter(alts.map(a =>
          a.map(t => array_contains(col("_ts"), t)).reduce(_ && _))
        .reduce(_ || _))
      .select("id")
  }

  /** All distinct tokens across the OR-alternatives of a complex query. */
  def queryTokens(query: String): Seq[String] =
    query.split("\\|\\|").toSeq.map(_.trim).filter(_.nonEmpty)
      .flatMap(_.split("\\s+").toSeq.filter(_.nonEmpty)).distinct

  /** Tokenize a query SEGMENT with the index's own tokenizer: terms only
    * match postings tokenized the same way (case folding, CJK dictionary
    * segmentation) — an index built with `T.tokensDict` holds "spark"
    * and segmented CJK terms, which a raw whitespace split of the query
    * can never hit. Evaluated over a one-row local relation
    * (ConvertToLocalRelation folds it driver-side — no job).
    */
  def queryTokensWith(spark: SparkSession, segment: String,
                      tokenizer: org.apache.spark.sql.Column =>
                        org.apache.spark.sql.Column): Seq[String] = {
    import spark.implicits._
    Seq(segment).toDF("_q")
      .select(tokenizer(col("_q")).as("_t"))
      .head().getSeq[String](0).distinct
  }

  /** The OR-alternatives of `"a b||c"`, each tokenized — by whitespace
    * (the default contract) or by the index's own tokenizer.
    */
  private def queryAlts(spark: SparkSession, query: String,
                        queryTokenizer: Option[org.apache.spark.sql.Column =>
                          org.apache.spark.sql.Column]): Seq[Seq[String]] =
    query.split("\\|\\|").toSeq.map(_.trim).filter(_.nonEmpty)
      .map { seg =>
        queryTokenizer match {
          case Some(tok) => queryTokensWith(spark, seg, tok)
          case None => seg.split("\\s+").toSeq.filter(_.nonEmpty).distinct
        }
      }.filter(_.nonEmpty)

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
    * GUARDED by the build-time stats sidecar, read driver-side — NO Spark
    * job runs to make the decision. Only id sets provably small get the
    * hint; above the cap (or with no stats, e.g. an ephemeral in-memory
    * index) the join is left unhinted and AQE picks shuffle-vs-broadcast
    * from the actual runtime size.
    */
  /** BM25 ranked retrieval (Robertson/Sparck-Jones; the ranked upgrade of
    * the reference's boolean fuzzy_match — above-parity, the way a
    * training-data pipeline scores query relevance). Index-routed:
    *
    *   1. shard-pruned postings for the query terms give the CANDIDATE
    *      docs (any term matches) and each term's document frequency —
    *      df_t is a ≤|terms|-row aggregate collected driver-side, so the
    *      idf weights become literals in the scoring expression;
    *   2. the corpus is semi-joined down to candidates; exact term
    *      frequencies come from re-tokenizing ONLY those rows (tf over
    *      the full token array, dl = DISTINCT-token length — the length
    *      the index also uses for `avgDocLen`);
    *   3. score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    *      idf_t = ln(1 + (N−df+0.5)/(df+0.5)); ranked output is
    *      TakeOrderedAndProject when `k` is set.
    *
    * Needs the build-time stats sidecar for N/avgdl (`stats.docCount`);
    * rebuild or re-save an old index to refresh it.
    */
  def bm25Search(df: DataFrame, textCol: String, idCol: String,
                 index: DataFrame, query: String, stats: IndexStats,
                 k: Int = 0, k1: Double = 1.2, b: Double = 0.75,
                 numShards: Option[Int] = None,
                 tokenizer: org.apache.spark.sql.Column =>
                   org.apache.spark.sql.Column = T.tokens,
                 queryTokenizer: Option[org.apache.spark.sql.Column =>
                   org.apache.spark.sql.Column] = None): DataFrame = {
    require(stats.docCount > 0,
      "index stats lack docCount — rebuild/re-save the index")
    // query terms under the same contract the INDEX was tokenized with:
    // pass queryTokenizer = Some(<the build tokenizer>) for an index
    // built with a non-default one (case folding / CJK segmentation),
    // or the raw whitespace terms can never hit its postings
    val toks = queryTokenizer match {
      case Some(tok) => queryTokensWith(df.sparkSession, query, tok)
      case None => queryTokens(query)
    }
    require(toks.nonEmpty, "empty query")
    val post = prunedPostings(index, toks, numShards)
    // df_t per query term — bounded by |terms|, becomes idf literals
    val dfreq = post.groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = stats.docCount.toDouble
    val idf = toks.map(t => t -> {
      val d = dfreq.getOrElse(t, 0L).toDouble
      math.log(1.0 + (n - d + 0.5) / (d + 0.5))
    }).filter(_._2 > 0)
    // idf can only empty when every term's df EXCEEDS the recorded
    // docCount — i.e. the caller-held stats predate index growth; the
    // bare reduce below would throw an opaque UnsupportedOperationException
    require(idf.nonEmpty,
      "every query term's document frequency exceeds the stats docCount " +
        "— the IndexStats are stale for this posting table; re-save the " +
        "index (or reload the sidecar) and retry")
    val cand = post.select(col("id").as(idCol)).distinct()
    val scored = df.join(cand, Seq(idCol), "left_semi")
      .withColumn("_toks", tokenizer(col(textCol)))
      .withColumn("_dl", size(array_distinct(col("_toks"))))
    val score = idf.map { case (t, w) =>
      val tf = size(filter(col("_toks"), x => x === lit(t))).cast("double")
      // a corpus whose every doc tokenizes empty has avgDocLen 0 — the
      // dl/avgdl term would then 0/0-abort the job under ANSI mode; any
      // positive floor is equivalent there (dl is 0 for every candidate)
      val avgdl = if (stats.avgDocLen > 0) stats.avgDocLen else 1.0
      lit(w) * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("_dl").cast("double") / lit(avgdl)))
    }.reduce(_ + _)
    val ranked = scored.withColumn("bm25", score)
      .drop("_toks", "_dl")
      .orderBy(col("bm25").desc_nulls_last, col(idCol).asc)
    if (k > 0) ranked.limit(k) else ranked
  }

  def search(df: DataFrame, idCol: String, index: DataFrame,
             query: String, numShards: Option[Int] = None,
             broadcastIdLimit: Long = defaultBroadcastIdLimit,
             stats: Option[IndexStats] = None,
             queryTokenizer: Option[org.apache.spark.sql.Column =>
               org.apache.spark.sql.Column] = None): DataFrame = {
    val alts = queryAlts(index.sparkSession, query, queryTokenizer)
    require(alts.nonEmpty, "empty query")
    val ids = matchIds(index, alts, numShards)
      .withColumnRenamed("id", idCol)
    val rhs = stats match {
      // bound with the SAME tokens the lookup uses — a custom tokenizer's
      // terms, not the raw whitespace split
      case Some(st)
          if statsBound(st, alts.flatten.distinct) <= broadcastIdLimit =>
        broadcast(ids)
      case _ => ids
    }
    df.join(rhs, Seq(idCol), "left_semi")
  }
}
