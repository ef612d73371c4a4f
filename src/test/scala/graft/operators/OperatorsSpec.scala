package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the query-compiler operators (reference filter_vectorized /
  * safe-eval / aggregate_vectorized behaviors from SURVEY.md §2.2/§2.4).
  */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, 10.0, "alpha beta gamma", "x"),
    (2L, 20.0, "beta delta", "y"),
    (3L, 30.0, "alpha delta epsilon", "x"),
    (4L, 40.0, "zeta", "y"),
    (5L, 50.0, "alpha beta", "x")).toDF("id", "v", "text", "tag")

  test("filter ops: comparisons, BETWEEN closed, LIKE regex, CONTAINS, NOT") {
    def ids(c: Cond*): Set[Long] =
      FilterVectorized(df, c.toSeq, List.fill(c.length - 1)("AND"))
        .select("id").as[Long].collect().toSet
    assert(ids(Cond("v", ">", 30.0)) == Set(4L, 5L))
    assert(ids(Cond("v", "BETWEEN", Seq(20.0, 40.0))) == Set(2L, 3L, 4L))
    assert(ids(Cond("text", "LIKE", "^al.*ta$")) == Set(5L))
    assert(ids(Cond("text", "CONTAINS", "alpha beta")) == Set(1L, 5L))
    assert(ids(Cond("text", "CONTAINS", "alpha beta||zeta")) == Set(1L, 4L, 5L))
    assert(ids(Cond("v", ">", 30.0, negation = true)) == Set(1L, 2L, 3L))
  }

  test("connectors fold LEFT-TO-RIGHT with no precedence") {
    // a OR b AND c  ==  (a OR b) AND c   (filter_vectorized.py:370-380)
    val out = FilterVectorized(df, Seq(
      Cond("id", "==", 1L), Cond("id", "==", 4L), Cond("v", "<", 35.0)),
      Seq("OR", "AND")).select("id").as[Long].collect().toSet
    assert(out == Set(1L)) // standard precedence would also keep id=4
  }

  test("paged filter: stable offset/limit") {
    val page = FilterVectorized.paged(df, Seq(Cond("v", ">", 10.0)), Nil,
      sortCols = Seq("id"), offset = 1, limit = 2)
      .select("id").as[Long].collect().toSeq
    assert(page == Seq(3L, 4L))
  }

  test("safe-eval string queries compile to Catalyst predicates") {
    assert(SafeExpr.filter(df, "v > 15 and v < 45").count() == 3)
    assert(SafeExpr.filter(df, "tag == 'x' or id in [2, 4]").count() == 5)
    assert(SafeExpr.filter(df, "not (v >= 20)").count() == 1)
    assert(SafeExpr.filter(df, "v % 20 == 0").count() == 2)
  }

  test("safe-eval blocks function calls and unknown identifiers") {
    intercept[IllegalArgumentException](SafeExpr.filter(df, "rand() > 0.5"))
    intercept[IllegalArgumentException](SafeExpr.filter(df, "nope > 1"))
    intercept[IllegalArgumentException](SafeExpr.filter(df, "v; drop table"))
  }

  test("safe-eval attribute access on array columns (reference whitelist)") {
    val e = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(-5.0f, 0.5f)),
      (3L, Seq(4.0f, 4.0f, 4.0f, 4.0f))).toDF("id", "emb")
    def ids(q: String): Set[Long] =
      SafeExpr.filter(e, q).select("id").as[Long].collect().toSet
    assert(ids("emb.size == 3") == Set(1L))
    assert(ids("emb.shape[0] >= 3") == Set(1L, 3L))
    assert(ids("emb.min < 0") == Set(2L))
    assert(ids("emb.max == 4.0") == Set(3L))
    assert(ids("emb.mean == 2.0") == Set(1L)) // (1+2+3)/3
    assert(ids("emb.size == 3 and emb.max > 2") == Set(1L))
  }

  test("safe-eval attribute access stays whitelisted") {
    val e = Seq((1L, Seq(1.0f))).toDF("id", "emb")
    // non-whitelisted attribute
    intercept[IllegalArgumentException](SafeExpr.filter(e, "emb.sum > 0"))
    // attribute on a non-column
    intercept[IllegalArgumentException](SafeExpr.filter(e, "foo.min > 0"))
    // arbitrary subscripts are blocked (only .shape[k])
    intercept[IllegalArgumentException](SafeExpr.filter(e, "emb[0] > 0"))
    intercept[IllegalArgumentException](SafeExpr.filter(e, "emb.min[0] > 0"))
    // shape requires an index
    intercept[IllegalArgumentException](SafeExpr.filter(e, "emb.shape > 0"))
    // dangling dot
    intercept[IllegalArgumentException](SafeExpr.filter(e, "emb. > 0"))
  }

  test("aggregateVectorized: one method per call, order direction") {
    val out = AggregateVectorized(df, Seq("tag"), Seq("v"), "sum",
      orderBy = Seq("sum_v"), direction = "DESC")
    assert(out.columns.toSeq == Seq("tag", "sum_v"))
    assert(out.as[(String, Double)].collect().toSeq ==
      Seq(("x", 90.0), ("y", 60.0)))
    val cnt = AggregateVectorized(df, Nil, Seq("*"), "count")
    assert(cnt.head().getLong(0) == 5L)
    intercept[IllegalArgumentException](
      AggregateVectorized(df, Nil, Seq("*"), "sum"))
  }

  test("inverted index: fuzzy AND of tokens, complex OR, search parity") {
    val idx = InvertedIndex.build(df, "text", "id")
    assert(InvertedIndex.fuzzyMatchIds(idx, "alpha beta")
      .as[Long].collect().toSet == Set(1L, 5L))
    assert(InvertedIndex.complexFuzzyIds(idx, "alpha beta||zeta")
      .as[Long].collect().toSet == Set(1L, 4L, 5L))
    // indexed search ≡ scan predicate
    val viaIndex = InvertedIndex.search(df, "id", idx, "alpha delta")
      .select("id").as[Long].collect().toSet
    val viaScan = df.filter(FilterVectorized.containsPredicate(
      col("text"), "alpha delta")).select("id").as[Long].collect().toSet
    assert(viaIndex == viaScan && viaIndex == Set(3L))
  }

  test("custom-tokenizer index is queryable via queryTokenizer") {
    // an index built with a non-default tokenizer (case folding, CJK
    // bigrams) holds terms a raw whitespace split of the query can never
    // hit — the query must pass through the SAME tokenizer
    val corpus = Seq((1L, "Spark 机器学习 toolkit"), (2L, "plain text"))
      .toDF("id", "text")
    val tok = (c: org.apache.spark.sql.Column) =>
      graft.functions.TextFunctions.tokensCjk(lower(c))
    val idx = InvertedIndex.build(corpus, "text", "id", tokenizer = tok)
    // whitespace query tokens miss (case + unsegmented CJK)
    assert(InvertedIndex.fuzzyMatchIds(idx, "Spark")
      .as[Long].collect().isEmpty)
    // routed through the index's tokenizer, they hit
    assert(InvertedIndex.fuzzyMatchIds(idx, "Spark",
        queryTokenizer = Some(tok)).as[Long].collect().toSet == Set(1L))
    assert(InvertedIndex.fuzzyMatchIds(idx, "机器学习",
        queryTokenizer = Some(tok)).as[Long].collect().toSet == Set(1L))
    assert(InvertedIndex.search(corpus, "id", idx, "SPARK 机器学习",
        queryTokenizer = Some(tok))
      .select("id").as[Long].collect().toSet == Set(1L))
    // bm25 with the same contract on both sides
    val stats = InvertedIndex.computeStats(idx)
    val ranked = InvertedIndex.bm25Search(corpus, "text", "id", idx,
      "Spark", stats, tokenizer = tok, queryTokenizer = Some(tok))
    assert(ranked.select("id").as[Long].collect().toSet == Set(1L))
  }

  test("bm25: stale stats (df past docCount) fail loudly, not with an empty reduce") {
    val corpus = Seq((1L, "apple"), (2L, "apple"), (3L, "apple"))
      .toDF("id", "text")
    val idx = InvertedIndex.build(corpus, "text", "id")
    // stats claiming a 1-doc corpus while the postings hold 3 docs:
    // idf(apple) goes negative and is filtered — the old code crashed on
    // an empty reduce; now the inconsistency is named
    val stale = IndexStats(Map("apple" -> 3L), 0L, docCount = 1L,
      avgDocLen = 1.0)
    val e = intercept[IllegalArgumentException](
      InvertedIndex.bm25Search(corpus, "text", "id", idx, "apple", stale)
        .collect())
    assert(e.getMessage.contains("stale"), e.getMessage)
  }

  test("bm25: index-routed ranking matches the formula over candidates only") {
    val corpus = Seq(
      (1L, "apple banana apple"),
      (2L, "apple"),
      (3L, "banana cherry"),
      (4L, "durian")).toDF("id", "text")
    val idx = InvertedIndex.build(corpus, "text", "id")
    val stats = InvertedIndex.computeStats(idx)
    assert(stats.docCount == 4L)
    assert(stats.avgDocLen == 1.5) // distinct tokens per doc: (2+1+2+1)/4
    val got = InvertedIndex.bm25Search(corpus, "text", "id", idx,
        "apple banana", stats)
      .select("id", "bm25").as[(Long, Double)].collect()
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L)) // durian: no query term
    val (n, k1, b) = (4.0, 1.2, 0.75)
    def idf(d: Long) = math.log(1 + (n - d + 0.5) / (d + 0.5))
    def part(tf: Int, w: Double, dl: Int) =
      w * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / 1.5))
    val exp = Map( // df(apple)=2, df(banana)=2
      1L -> (part(2, idf(2), 2) + part(1, idf(2), 2)),
      2L -> part(1, idf(2), 1),
      3L -> part(1, idf(2), 2))
    got.foreach { case (id, s) => assert(math.abs(s - exp(id)) < 1e-12) }
    assert(got.head._1 == 1L) // both terms + highest tf ranks first
  }

  test("sampling: md5-coin reproducible + salted + nested; quota caps groups") {
    val big = (1 to 1000).toDF("id")
    def sample(f: Double, salt: String = "") =
      Sampling.deterministicSample(big, "id", f, salt)
        .as[Int].collect().toSet
    val a = sample(0.3)
    assert(a == sample(0.3))               // pure function of the key
    assert(math.abs(a.size - 300) < 75)    // ~fraction of the corpus
    assert(sample(0.3, "x") != a)          // salts are independent coins
    assert(sample(0.1).subsetOf(a))        // fractions nest (same coin)
    val g = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("grp", "id")
    val q = Sampling.quotaPerGroup(g, "grp", "id", "id", 2)
      .as[(String, Int)].collect().toSet
    assert(q == Set(("a", 1), ("a", 2), ("b", 9))) // lowest-order rows win
  }

  // the engine-independent md5 coin, recomputed outside Spark
  private def modelCoin(key: String, salt: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((key + salt).getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  test("packing: concat-and-chop layout matches an independent model") {
    val docs = (0L until 400L).map(i => (i, i % 7 + 1)).toDF("id", "ntok")
    def pack(df: org.apache.spark.sql.DataFrame) =
      Sampling.packByBudget(df, "id", col("ntok"), budget = 16L,
          streams = 4, salt = "p")
        .select("id", "stream", "block", "block_offset")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val got = pack(docs)
    // layout is a pure function of (ids, counts): repartitioning is a no-op
    assert(got == pack(docs.repartition(13)))
    // independent model: coin → stream, per-stream (coin, id) order,
    // running start, chop at the budget boundary
    val model = (0L until 400L).map { id =>
      (id, modelCoin(id.toString, "p"), id % 7 + 1) }
      .groupBy { case (_, c, _) => c % 4 }
      .flatMap { case (stream, rows) =>
        var start = 0L
        rows.sortBy { case (id, c, _) => (c, id) }.map { case (id, _, n) =>
          val s = start; start += n
          (id, stream, s / 16, s % 16)
        }
      }.toSeq.sortBy(_._1)
    assert(got == model)
    // every address is inside its block
    assert(got.forall { case (_, _, b, off) => b >= 0 && off >= 0 && off < 16 })
  }

  test("mixture: per-source rates hit the target weights, no upsampling") {
    val rows = (0 until 900).map(i => (i.toLong, s"s${i % 3}"))
      .toDF("id", "source")
    // counts are 300 each; weights 0.5 vs 0.25 → s0 keeps all (most
    // over-weighted), s1 keeps ~half; s2 is unweighted → dropped; the
    // weight naming an absent source is ignored
    def mix() = Sampling.mixBySource(rows, "id", "source",
      Map("s0" -> 0.5, "s1" -> 0.25, "zz" -> 1.0), salt = "m")
      .select("id", "source").as[(Long, String)].collect().sortBy(_._1).toSeq
    val kept = mix()
    assert(kept == mix()) // deterministic
    val bySrc = kept.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc("s0") == 300, s"max-rate source must keep all: $bySrc")
    assert(!bySrc.contains("s2"), "unweighted source must drop")
    assert(math.abs(bySrc("s1") - 150) < 60, s"~half of s1: $bySrc")
    // the kept set is the coin filter: every kept s1 row's coin is below
    // the same cutoff an external system would compute
    val cut = ((0.25 / 300.0) / (0.5 / 300.0) * (1L << 60).toDouble).toLong
    kept.filter(_._2 == "s1").foreach { case (id, _) =>
      assert(modelCoin(id.toString, "m") < cut) }
  }

  test("mixture: high-cardinality sources never collect to the driver") {
    // 100k distinct sources (a user passing a domain column): the cutoff
    // computation is distributed — only a scalar max reaches the driver —
    // so this must complete, keep every weighted row's source-local
    // semantics, and drop the unweighted tail
    val n = 100000
    val rows = (0 until n).map(i => (i.toLong, s"d$i")).toDF("id", "source")
    val weights = (0 until n by 2).map(i => s"d$i" -> 1.0).toMap
    val kept = Sampling.mixBySource(rows, "id", "source", weights, "hc")
      .select("source").as[String].collect()
    // every source has exactly 1 row and equal weight → every ratio is
    // the max → every weighted row kept, every unweighted row dropped
    assert(kept.length == n / 2)
    assert(kept.forall(s => s.stripPrefix("d").toInt % 2 == 0))
  }

  test("mixture: non-string source column and null sources are safe") {
    val rows = Seq((1L, Some(10)), (2L, Some(20)), (3L, None), (4L, Some(10)))
      .toDF("id", "source")
    // int source column: weights are string-keyed, compared as strings
    val kept = Sampling.mixBySource(rows, "id", "source",
        Map("10" -> 1.0), salt = "ns")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L), s"int-keyed source must match: $kept")
    // the null-source row is dropped silently (unweighted), not an NPE;
    // weights ∝ counts (2:1) → both sources at the max rate, keep all
    val both = Sampling.mixBySource(rows, "id", "source",
        Map("10" -> 2.0, "20" -> 1.0), salt = "ns")
      .select("id").as[Long].collect().toSet
    assert(both == Set(1L, 2L, 4L))
  }

  test("packing: duplicate ids never double-count ties (ROWS frame)") {
    // two rows share id=5: the default RANGE frame would sum BOTH as
    // peers of each other (start jumps by 2·ntok); the ROWS frame keeps
    // the running sum positional, so total stream lengths stay exact
    val docs = ((0L until 10L).map(i => (i, 3)) :+ (5L, 3))
      .toDF("id", "ntok")
    val got = Sampling.packByBudget(docs, "id", col("ntok"), budget = 100L,
        streams = 1, salt = "dup")
      .select("block_offset").as[Long].collect().sorted.toSeq
    // 11 rows × 3 tokens in one stream, one block: offsets are exactly
    // 0,3,6,...,30 — RANGE would emit 15 twice and skip 18
    assert(got == (0L until 11L).map(_ * 3))
  }
}
