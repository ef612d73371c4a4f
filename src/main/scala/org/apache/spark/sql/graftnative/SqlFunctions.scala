package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StringType

import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** SQL bindings for the graft function surface: every scalar function the
  * Scala API exposes ([[graft.functions.TextFunctions]] /
  * [[graft.functions.VectorFunctions]] / the native expressions) becomes a
  * `graft_*` SQL function, so `spark.sql("SELECT graft_lang_id(body) ...")`
  * works for SQL-only and Python users — the same consumability gap the
  * `graft` data source closed for tables (the reference's query surface is
  * reachable from its Python API everywhere, muller/api/dataset.py; with
  * the DSV2 source + these registrations the whole pipeline — read,
  * scrub, dedup-key, score, vector math — is expressible in pure SQL).
  *
  * Each builder round-trips through the existing Column functions, so the
  * SQL route produces EXACTLY the expression tree the Scala route does —
  * same codegen, same oracle semantics, nothing re-implemented. Scalar
  * parameters (shingle width, regex, hash count) must be literals —
  * they parameterize the generated plan, they are not per-row inputs —
  * and a non-literal argument fails analysis with a clear message.
  *
  * Registered by [[GraftSparkExtensions]] (builder-time) and
  * [[GraftExtensions.install]] (post-hoc on a live session).
  */
object SqlFunctions {

  type Builder = Seq[Expression] => Expression

  private def c(e: Expression): Column = ExpressionUtils.column(e)

  /** Column → Expression, EAGERLY: `ExpressionUtils.expression` wraps the
    * column node in a lazy `ColumnNodeExpression` that only the Dataset
    * API entry points convert — returned from a FunctionRegistry builder
    * it would survive analysis unconverted and die at codegen. The
    * converter inlines the whole node tree into plain Catalyst
    * expressions (nested `UnresolvedFunction`s are fine — the analyzer
    * resolves them after the builder returns).
    */
  private def x(col: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(col.node)

  /** A literal scalar parameter: foldable → eval at plan time. */
  private def litInt(fn: String, arg: String, e: Expression): Int = {
    require(e.foldable, s"$fn: $arg must be a literal integer")
    e.eval() match {
      case i: Int => i
      case l: Long => math.toIntExact(l)
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case v => throw new IllegalArgumentException(
        s"$fn: $arg must be a literal integer, got $v")
    }
  }

  private def litStr(fn: String, arg: String, e: Expression): String = {
    require(e.foldable && e.dataType == StringType,
      s"$fn: $arg must be a literal string")
    String.valueOf(e.eval())
  }

  private def litStrArray(fn: String, arg: String,
                          e: Expression): Seq[String] = {
    val ok = e.foldable && (e.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) => true
      case _ => false
    })
    require(ok, s"$fn: $arg must be a literal array<string>")
    e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(StringType).toIndexedSeq.map(String.valueOf)
  }

  private def litBool(fn: String, arg: String, e: Expression): Boolean = {
    require(e.foldable &&
      e.dataType == org.apache.spark.sql.types.BooleanType,
      s"$fn: $arg must be a literal boolean")
    e.eval().asInstanceOf[Boolean]
  }

  private def arity(fn: String, n: Int): Nothing =
    throw new IllegalArgumentException(s"$fn expects $n argument(s)")

  private def f1(fn: String)(f: Column => Column): (String, Builder) =
    fn -> { case Seq(a) => x(f(c(a))); case _ => arity(fn, 1) }

  private def f2(fn: String)(f: (Column, Column) => Column): (String, Builder) =
    fn -> { case Seq(a, b) => x(f(c(a), c(b))); case _ => arity(fn, 2) }

  private def fInt(fn: String, arg: String)(
      f: (Column, Int) => Column): (String, Builder) =
    fn -> { case Seq(a, n) => x(f(c(a), litInt(fn, arg, n)))
            case _ => arity(fn, 2) }

  /** name → builder for every registered function. */
  val all: Seq[(String, Builder)] = Seq(
    // text: tokenization + quality signals
    f1("graft_tokens")(T.tokens),
    f1("graft_tokens_cjk")(T.tokensCjk),
    f1("graft_token_count")(T.tokenCount),
    f1("graft_token_estimate")(T.tokenEstimate),
    f1("graft_stopword_count")(T.stopwordCount),
    f1("graft_stopword_ratio")(T.stopwordRatio),
    f1("graft_mean_word_len")(T.meanWordLen),
    f1("graft_punct_ratio")(T.punctRatio),
    f1("graft_quality_score")(T.qualityScore),
    f1("graft_lang_id")(T.langId),
    // text: fingerprints + shingles
    f1("graft_fingerprint_md5")(T.fingerprintMd5),
    f1("graft_rolling_hash")(T.rollingHash),
    fInt("graft_char_shingles", "n")(T.charShingles),
    fInt("graft_token_shingles", "n")(T.tokenShingles),
    fInt("graft_ngram_repetition", "n")(T.ngramRepetition),
    fInt("graft_top_ngram_fraction", "n")(T.topNgramFraction),
    fInt("graft_dup_ngram_fraction", "n")(T.dupNgramFraction),
    // text: PII scrub (default pattern set; counts audit on the original)
    f1("graft_pii_scrub")(col => T.piiScrub(col, T.piiPatterns)._1),
    f1("graft_pii_counts")(col => T.piiScrub(col, T.piiPatterns)._2),
    "graft_redact" -> { es: Seq[Expression] => es match {
      case Seq(a, p, t) => x(T.redact(c(a), litStr("graft_redact", "pattern", p),
        litStr("graft_redact", "token", t)))
      case _ => arity("graft_redact", 3)
    }},
    "graft_redaction_count" -> { es: Seq[Expression] => es match {
      case Seq(a, p) => x(T.redactionCount(c(a),
        litStr("graft_redaction_count", "pattern", p)))
      case _ => arity("graft_redaction_count", 2)
    }},
    // dictionary CJK tokenizer (jieba DAG route; optional HMM OOV pass)
    "graft_tokens_dict" -> { es: Seq[Expression] => es match {
      case Seq(a, d) => x(T.tokensDict(c(a),
        litStrArray("graft_tokens_dict", "dict", d)))
      case Seq(a, d, h) => x(T.tokensDict(c(a),
        litStrArray("graft_tokens_dict", "dict", d),
        hmm = litBool("graft_tokens_dict", "hmm", h)))
      case _ => throw new IllegalArgumentException(
        "graft_tokens_dict expects (text, dict) or (text, dict, hmm)")
    }},
    // dedup hash families (native codegen'd expressions)
    f1("graft_simhash32")(NativeExpressions.simHash32),
    f1("graft_simhash60_md5")(NativeExpressions.simHash60Md5),
    fInt("graft_minhash_sig", "num_hashes")((col, k) =>
      NativeExpressions.minHashSig(col, k)),
    fInt("graft_minhash_bands", "rows_per_band")((col, r) =>
      NativeExpressions.minHashBands(col, r)),
    // vector math (float fast path + deterministic scaled-int path)
    f2("graft_dot")(V.dot),
    f2("graft_l2sq")(V.l2Sq),
    f2("graft_cosine")(V.cosine),
    f1("graft_norm_sq")(V.normSq),
    f1("graft_normalize")(V.normalize),
    f2("graft_dot_scaled")(V.dotScaled),
    f2("graft_l2sq_scaled")(V.l2SqScaled),
    f2("graft_cosine_scaled")(V.cosineScaled))

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(SqlFunctions.getClass.getCanonicalName, name)

  /** The descriptions `SparkSessionExtensions.injectFunction` takes. */
  def descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] =
    all.map { case (name, b) => (FunctionIdentifier(name), info(name), b) }

  /** Post-hoc registration on a live session (idempotent — re-register
    * overwrites with the identical builder).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptions.foreach { case (id, ei, b) =>
      spark.sessionState.functionRegistry.registerFunction(id, ei, b)
    }
}
