package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.SqlFunctions

import graft.SparkSpec

/** The `graft_*` SQL registrations route to the exact Column functions the
  * Scala API uses — every SQL call must equal its Scala-API twin on the
  * same rows, and literal-parameter misuse must fail analysis loudly.
  */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    // functions only — installing the full GraftExtensions would also add
    // the optimizer rule to the SHARED session and break IndexSpec's
    // "without the rule" baseline
    SqlFunctions.install(spark)
    val df = Seq(
      ("d1", "The quick brown fox jumps over the lazy dog and the cat"),
      ("d2", "el la de que es el la de que es"),
      ("d3", "Call 555-867-5309 or mail a.b@test.org today"),
      ("d4", ""),
      ("d5", "aaa bbb aaa bbb aaa bbb ccc")).toDF("id", "body")
    df.createOrReplaceTempView("sqlfn_docs")
    df
  }

  test("every registered function parses, analyzes, and runs via SQL") {
    docs
    // one SELECT exercising each 1-arg/2-arg registration end-to-end
    val sql = spark.sql("""
      SELECT id,
        graft_token_count(body) AS tc,
        graft_token_estimate(body) AS te,
        graft_stopword_count(body) AS swc,
        graft_stopword_ratio(body) AS swr,
        graft_mean_word_len(body) AS mwl,
        graft_punct_ratio(body) AS pr,
        graft_quality_score(body) AS qs,
        graft_lang_id(body) AS lang,
        graft_fingerprint_md5(body) AS fp,
        graft_rolling_hash(body) AS rh,
        graft_char_shingles(body, 3) AS cs,
        graft_token_shingles(body, 2) AS ts,
        graft_ngram_repetition(body, 2) AS rep,
        graft_top_ngram_fraction(body, 2) AS topf,
        graft_dup_ngram_fraction(body, 2) AS dupf,
        graft_pii_scrub(body) AS scrubbed,
        graft_pii_counts(body) AS pii,
        graft_redact(body, '[0-9]+', '#') AS red,
        graft_redaction_count(body, '[0-9]+') AS redn,
        graft_simhash32(graft_tokens(body)) AS sh32,
        graft_simhash60_md5(graft_tokens(body)) AS sh60,
        graft_minhash_sig(graft_tokens(body), 16) AS sig,
        graft_minhash_bands(graft_minhash_sig(graft_tokens(body), 16), 4) AS bands
      FROM sqlfn_docs""")
    val viaScala = docs.select(col("id"),
      TextFunctions.tokenCount(col("body")).as("tc"),
      TextFunctions.tokenEstimate(col("body")).as("te"),
      TextFunctions.stopwordCount(col("body")).as("swc"),
      TextFunctions.stopwordRatio(col("body")).as("swr"),
      TextFunctions.meanWordLen(col("body")).as("mwl"),
      TextFunctions.punctRatio(col("body")).as("pr"),
      TextFunctions.qualityScore(col("body")).as("qs"),
      TextFunctions.langId(col("body")).as("lang"),
      TextFunctions.fingerprintMd5(col("body")).as("fp"),
      TextFunctions.rollingHash(col("body")).as("rh"),
      TextFunctions.charShingles(col("body"), 3).as("cs"),
      TextFunctions.tokenShingles(col("body"), 2).as("ts"),
      TextFunctions.ngramRepetition(col("body"), 2).as("rep"),
      TextFunctions.topNgramFraction(col("body"), 2).as("topf"),
      TextFunctions.dupNgramFraction(col("body"), 2).as("dupf"),
      TextFunctions.piiScrub(col("body"), TextFunctions.piiPatterns)._1.as("scrubbed"),
      TextFunctions.piiScrub(col("body"), TextFunctions.piiPatterns)._2.as("pii"),
      TextFunctions.redact(col("body"), "[0-9]+", "#").as("red"),
      TextFunctions.redactionCount(col("body"), "[0-9]+").as("redn"),
      NativeExpressions.simHash32(TextFunctions.tokens(col("body"))).as("sh32"),
      NativeExpressions.simHash60Md5(TextFunctions.tokens(col("body"))).as("sh60"),
      NativeExpressions.minHashSig(TextFunctions.tokens(col("body")), 16).as("sig"),
      NativeExpressions.minHashBands(
        NativeExpressions.minHashSig(TextFunctions.tokens(col("body")), 16), 4).as("bands"))
    assert(sql.orderBy("id").collect().toSeq ==
      viaScala.orderBy("id").collect().toSeq)
    // spot-check semantics survived the SQL route
    val byId = sql.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("d2").getAs[String]("lang") == "es")
    assert(byId("d3").getAs[String]("scrubbed").contains("<PII>"))
    assert(byId("d5").getAs[Double]("dupf") > 0.5)
    // totality on degenerate input (ANSI mode must not abort the job):
    // empty doc → null ratios, quality 0, empty-but-defined aggregates
    val d4 = byId("d4")
    assert(d4.isNullAt(d4.fieldIndex("swr")))
    assert(d4.isNullAt(d4.fieldIndex("mwl")))
    assert(d4.isNullAt(d4.fieldIndex("pr")))
    assert(d4.getAs[Double]("qs") == 0.0)
    assert(d4.getAs[Long]("rh") == 0L)
  }

  test("vector functions via SQL match the Scala API") {
    docs
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f), Array(0.5f, 1.0f, -1.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f), Array(3.0f, 4.0f, 0.0f)))
      .toDF("id", "a", "b")
    vecs.createOrReplaceTempView("sqlfn_vecs")
    val sql = spark.sql("""
      SELECT id, graft_dot(a, b) AS d, graft_l2sq(a, b) AS l2,
        graft_cosine(a, b) AS cos, graft_norm_sq(a) AS n2,
        graft_normalize(a) AS u,
        graft_dot_scaled(a, b) AS ds, graft_l2sq_scaled(a, b) AS l2s,
        graft_cosine_scaled(a, b) AS coss
      FROM sqlfn_vecs""")
    val viaScala = vecs.select(col("id"),
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.l2Sq(col("a"), col("b")).as("l2"),
      VectorFunctions.cosine(col("a"), col("b")).as("cos"),
      VectorFunctions.normSq(col("a")).as("n2"),
      VectorFunctions.normalize(col("a")).as("u"),
      VectorFunctions.dotScaled(col("a"), col("b")).as("ds"),
      VectorFunctions.l2SqScaled(col("a"), col("b")).as("l2s"),
      VectorFunctions.cosineScaled(col("a"), col("b")).as("coss"))
    assert(sql.orderBy("id").collect().toSeq ==
      viaScala.orderBy("id").collect().toSeq)
    val r1 = sql.filter($"id" === 1L).head()
    assert(math.abs(r1.getAs[Double]("d") - (-1.5)) < 1e-9)
    // zero vector → cosine undefined → null (not an ANSI abort)
    val r2 = sql.filter($"id" === 2L).head()
    assert(r2.isNullAt(r2.fieldIndex("cos")))
    assert(r2.isNullAt(r2.fieldIndex("coss")))
  }

  test("dictionary CJK tokenizer via SQL matches the Scala API") {
    docs
    val cjk = Seq(("c1", "我们研究生命的起源"), ("c2", "Spark 研究 data"))
      .toDF("id", "body")
    cjk.createOrReplaceTempView("sqlfn_cjk")
    val sql = spark.sql("""
      SELECT id,
        graft_tokens_dict(body, array('研究', '生命', '起源', '我们')) AS t2,
        graft_tokens_dict(body, array('研究'), true) AS t3
      FROM sqlfn_cjk""")
    val viaScala = cjk.select(col("id"),
      TextFunctions.tokensDict(col("body"),
        Seq("研究", "生命", "起源", "我们")).as("t2"),
      TextFunctions.tokensDict(col("body"), Seq("研究"), hmm = true).as("t3"))
    assert(sql.orderBy("id").collect().toSeq ==
      viaScala.orderBy("id").collect().toSeq)
    assert(sql.filter($"id" === "c1").head().getSeq[String](1)
      .containsSlice(Seq("研究", "生命")))
  }

  test("non-literal scalar parameters fail analysis with a clear message") {
    docs
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_token_shingles(body, graft_token_count(body)) " +
          "FROM sqlfn_docs").collect()
    }
    assert(e.getMessage.contains("literal integer"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_token_count(body, 2) FROM sqlfn_docs").collect()
    }
    assert(e2.getMessage.contains("expects 1 argument"))
  }

  test("builder-time extensions registration exposes the same functions") {
    // a FRESH session configured with spark.sql.extensions (the
    // cluster-conf route a SQL-only user takes) must resolve graft_*
    // without any Scala-API call. Clearing active/default makes
    // getOrCreate build a NEW session (over the shared SparkContext)
    // whose state applies the extensions conf; restore after.
    // getOrCreate reads spark.sql.extensions from the (already running)
    // SparkContext's conf, not the builder, so set it there for the
    // duration of the test
    import org.apache.spark.sql.SparkSession
    val prior = spark
    val sc = prior.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    org.apache.spark.sql.graftnative.TestSparkConf.set(sc,
      "spark.sql.extensions",
      "org.apache.spark.sql.graftnative.GraftSparkExtensions")
    try {
      val fresh = SparkSession.builder().getOrCreate()
      assert(fresh ne prior)
      assert(SqlFunctions.all.nonEmpty)
      val n = fresh.sql("SELECT graft_token_count('one two three') AS n")
        .head().getInt(0)
      assert(n == 3)
    } finally {
      org.apache.spark.sql.graftnative.TestSparkConf.remove(
        sc, "spark.sql.extensions")
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
