package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language-ID heuristics,
  * fingerprinting. All pure Catalyst expressions (codegen'd, no UDFs).
  *
  * The reference has no scalar-function catalog (SURVEY.md §2.12); its text
  * handling lives in the tokenizer of the inverted index
  * (muller/core/query/inverted_index_vectorized.py:121-158). We standardize
  * on a whitespace tokenizer (the corpus is space-separated; a CJK
  * segmenter would slot in behind the same `tokens` entry point).
  */
object TextFunctions {

  /** Whitespace tokenizer; drops empty tokens. */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => t =!= lit(""))

  /** CJK-aware tokenizer: Han-script runs are segmented into overlapping
    * character bigrams (the standard dictionary-free CJK indexing
    * technique; a jieba-style dictionary segmenter would slot in behind
    * the same entry point — the reference pins jieba,
    * inverted_index_vectorized.py:121-158), while the remaining text
    * splits on whitespace. Pure expressions, no UDF.
    */
  def tokensCjk(c: Column): Column = {
    val cjkRuns = regexp_extract_all(c, lit("\\p{IsHan}+"), lit(0))
    val bigrams = flatten(transform(cjkRuns, r =>
      when(length(r) === 1, array(r))
        .otherwise(transform(sequence(lit(1), length(r) - 1),
          i => r.substr(i, lit(2))))))
    val latin = filter(
      split(regexp_replace(c, "\\p{IsHan}+", " "), "\\s+"),
      t => t =!= lit(""))
    concat(latin, bigrams)
  }

  /** Dictionary CJK tokenizer with the reference's build options
    * (inverted_index_vectorized.py:121-158): `dict` ≙ compulsory/user
    * words, `stopWords` filtered after segmentation, lowercase unless
    * `caseSensitive`. Non-Han text splits on whitespace. Tokens in text
    * order. Han runs segment via jieba's DAG max-probability route by
    * default (`fmm = true` for greedy forward maximum matching); `freqs`
    * optionally carries per-word counts parallel to `dict` — a real
    * jieba-style frequency dictionary — and defaults to uniform weights.
    * `hmm = true` runs jieba's BMES-Viterbi OOV pass over buffered
    * single-char spans (jieba's `cut` default), so multi-char OOV words
    * segment as words; the default `hmm = false` is jieba `HMM=False`.
    * `emissions` optionally carries a per-character BMES emission table
    * (jieba's `prob_emit` format: char → 4 log-probs for B, M, E, S) —
    * the emission model is DATA, like the dictionary; the default is
    * uniform emissions, where the Viterbi follows the transition model's
    * word-shape prior alone.
    */
  def tokensDict(c: Column, dict: Seq[String],
                 stopWords: Seq[String] = Nil,
                 caseSensitive: Boolean = false,
                 freqs: Seq[Long] = Nil,
                 fmm: Boolean = false,
                 hmm: Boolean = false,
                 emissions: Map[String, Seq[Double]] = Map.empty): Column =
    org.apache.spark.sql.graftnative.DictTokens(c, dict, stopWords,
      caseSensitive, freqs, useDag = !fmm, hmm = hmm, emitP = emissions)

  /** Emission table derived from the frequency dictionary itself (the
    * `prob_emit` construction with the dict as the tagged corpus) — use
    * as `tokensDict(..., hmm = true, emissions = deriveEmissions(d, f))`
    * when no real `prob_emit` data is at hand, so OOV boundaries get
    * per-character evidence instead of the bare word-shape prior.
    */
  def deriveEmissions(dict: Seq[String], freqs: Seq[Long] = Nil)
      : Map[String, Seq[Double]] =
    org.apache.spark.sql.graftnative.DictTokens.deriveEmitP(dict, freqs)

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword estimate: word count + extra tokens for long words
    * (a deterministic stand-in for a real BPE vocab: every 4 chars beyond
    * the first 4 costs an extra token).
    */
  def tokenEstimate(c: Column): Column =
    aggregate(
      transform(tokens(c), t =>
        lit(1L) + floor((length(t) - lit(1)) / lit(4)).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Small fixed English stopword set used by quality scoring / lang-id. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def stopwordCount(c: Column): Column = {
    val sw = array(stopwords.map(lit): _*)
    size(filter(tokens(c), t => array_contains(sw, t)))
  }

  /** Stopword ratio — classic quality-scoring feature. Exact: scaled-int
    * numerator/denominator avoid any float division ambiguity. Null for
    * a token-less doc (`try_divide`, matching DuckDB's NULL-on-x/0):
    * under ANSI mode (the Spark 4 default) a plain `/` would kill the
    * whole job on the first empty document — at 100 TB there IS an
    * empty document.
    */
  def stopwordRatio(c: Column): Column =
    try_divide(stopwordCount(c).cast("double"), tokenCount(c).cast("double"))

  /** Mean word length (characters per token); null for a token-less doc. */
  def meanWordLen(c: Column): Column =
    try_divide(
      aggregate(transform(tokens(c), t => length(t).cast("long")),
        lit(0L), (acc, v) => acc + v).cast("double"),
      tokenCount(c).cast("double"))

  /** Non-alphanumeric character ratio (punctuation/symbol density);
    * null for an empty string.
    */
  def punctRatio(c: Column): Column =
    try_divide(
      (length(c) - length(regexp_replace(c, "[^a-zA-Z0-9 ]", ""))).cast("double"),
      length(c).cast("double"))

  /** Composite quality score in [0,1]: rewards mid-length docs, few
    * stopwords is suspicious for English, punctuation noise penalized.
    * Deterministic closed-form so it is oracle-checkable.
    */
  def qualityScore(c: Column): Column = {
    val lenScore = least(tokenCount(c).cast("double") / lit(64.0), lit(1.0))
    val swScore = least(stopwordRatio(c) * lit(8.0), lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(c) * lit(4.0), lit(1.0))
    // token-less docs: the ratios are null (undefined) — score them 0
    // explicitly instead of letting least()'s null-skipping invent a
    // nonzero score for empty text
    when(tokenCount(c) === 0, lit(0.0))
      .otherwise((lenScore + swScore + punctPenalty) / lit(3.0))
  }

  /** N-gram-heuristic language ID: counts marker-token hits per language,
    * picks the argmax (ties → 'und'). Marker lists are tiny stand-ins for
    * real char-n-gram profiles; the plumbing (score-per-lang + argmax in
    * one pass) is the scale-relevant part.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScore(c: Column, lang: String): Column = {
    val markers = array(langMarkers(lang).map(lit): _*)
    size(filter(tokens(c), t => array_contains(markers, t)))
  }

  def langId(c: Column): Column = {
    // argmax with deterministic tie-break by language code order;
    // all-zero → 'und'
    val langs = langMarkers.keys.toSeq.sorted
    val scored = langs.map(l => struct(langScore(c, l).as("score"), lit(l).as("lang")))
    val best = aggregate(
      array(scored: _*),
      struct(lit(0).as("score"), lit("und").as("lang")),
      (acc, s) => when(s.getField("score") > acc.getField("score"), s).otherwise(acc))
    best.getField("lang")
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key.
    */
  def fingerprintMd5(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** 64-bit rolling (polynomial) hash over tokens, base 31 mod 2^61-1.
    * Order-sensitive: permuted token order → different fingerprint, unlike
    * a bag-of-tokens hash. Used for shift-robust document fingerprinting.
    */
  def rollingHash(c: Column): Column = {
    val mod = lit(2305843009213693951L) // p = 2^61 - 1
    aggregate(
      transform(tokens(c), t => (hash(t).cast("long") + lit(2147483648L))),
      lit(0L),
      // acc·31 mod p without 64-bit overflow (acc < 2^61, so a plain
      // acc*31 exceeds Long range — ANSI mode would abort the job):
      // acc·31 = (acc<<5) − acc, and for the Mersenne p,
      // (acc<<5) mod p = (low<<5) + high with low = acc mod 2^56,
      // high = acc >> 56 (2^61 ≡ 1 mod p). Every intermediate stays
      // well inside int64: low<<5 < 2^61, high < 32, v < 2^32.
      (acc, v) => {
        val low = acc.bitwiseAND(lit((1L << 56) - 1))
        val high = shiftright(acc, 56)
        pmod(shiftleft(low, 5) + high - acc + v, mod)
      })
  }

  /** Engine-portable token hash: first `bits/4` hex chars of md5 as an
    * unsigned int in a long (bits ≤ 60 keeps it positive). Slower than
    * murmur3 but reproducible in any engine with md5 (DuckDB, Trino, ...)
    * — the hash behind the oracle-checkable SimHash variant.
    */
  def tokenHashBits(t: Column, bits: Int): Column = {
    require(bits % 4 == 0 && bits > 0 && bits <= 60, s"bad bits $bits")
    conv(substring(md5(t), 1, bits / 4), 16, 10).cast("long")
  }

  /** Character n-gram shingles of the normalized text (distinct), for
    * Jaccard. Guarded: Spark `sequence(a,b)` DESCENDS when a > b, so short
    * texts must short-circuit to an empty array.
    */
  def charShingles(c: Column, n: Int): Column = {
    val norm = regexp_replace(lower(trim(c)), "\\s+", " ")
    when(length(norm) >= lit(n),
      array_distinct(
        transform(sequence(lit(1), length(norm) - lit(n - 1)),
          i => norm.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Token n-gram shingles (distinct), for n-gram Jaccard similarity. */
  def tokenShingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) >= lit(n),
      array_distinct(
        transform(sequence(lit(1), size(toks) - lit(n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Token n-gram occurrences WITH multiplicity — repetition signals need
    * the full occurrence list ([[tokenShingles]] dedups for Jaccard).
    */
  def tokenShinglesAll(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) >= lit(n),
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Both repetition signals in one pass, as a struct
    * `(top_fraction, dup_fraction)` — inspired by the Gopher repetition
    * filters (Rae et al. 2021 §A1.2), but measured over n-gram
    * OCCURRENCES, not the paper's character mass: thresholds from the
    * paper do not transfer directly.
    *
    *  - top_fraction: share of n-gram occurrences taken by the single
    *    most frequent n-gram (boilerplate/spam flag).
    *  - dup_fraction: share of occurrences belonging to n-grams seen
    *    more than once.
    *
    * Null when the doc has no n-grams. Single `array_sort` +
    * run-length `aggregate` pass — O(n log n) per row, no shuffle, and
    * the shingle array is bound exactly once (Catalyst has no CSE
    * across HOF references, so repeated references would re-tokenize).
    */
  def ngramRepetition(c: Column, n: Int): Column = {
    val sorted = array_sort(tokenShinglesAll(c, n))
    aggregate(
      sorted,
      // grams are non-empty (tokens drop empties), so "" is a safe
      // run-start sentinel
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"),
        lit(0L).as("dup"), lit(0L).as("total")),
      (acc, v) => {
        val run = when(v === acc.getField("prev"),
          acc.getField("run") + lit(1L)).otherwise(lit(1L))
        // occurrences in runs longer than 1: pay 2 when a run reaches
        // length 2 (the first occurrence retroactively counts), then 1
        val dupAdd = when(run === 2L, lit(2L))
          .when(run > 2L, lit(1L)).otherwise(lit(0L))
        struct(v.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"),
          (acc.getField("dup") + dupAdd).as("dup"),
          (acc.getField("total") + lit(1L)).as("total"))
      },
      st => when(st.getField("total") > 0L, struct(
        (st.getField("best").cast("double") /
          st.getField("total").cast("double")).as("top_fraction"),
        (st.getField("dup").cast("double") /
          st.getField("total").cast("double")).as("dup_fraction"))))
  }

  /** Top n-gram fraction — see [[ngramRepetition]]. Prefer binding
    * `ngramRepetition` once when both signals are needed.
    */
  def topNgramFraction(c: Column, n: Int): Column =
    ngramRepetition(c, n).getField("top_fraction")

  /** Duplicate n-gram fraction — see [[ngramRepetition]]. */
  def dupNgramFraction(c: Column, n: Int): Column =
    ngramRepetition(c, n).getField("dup_fraction")

  /** PII scrub patterns — the regex dialect subset that behaves
    * identically across engines (character classes + bounded repetition,
    * no lookaround). Email/phone/SSN are the classic crawl-scrub set;
    * digitRun redacts bare numeric identifiers.
    */
  val piiPatterns: Map[String, String] = Map(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}",
    "ssn" -> "[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "digitRun" -> "[0-9]+")

  /** Replace every match of `pattern` with `token` — one codegen'd
    * regexp_replace, applied at the scan (no shuffle).
    */
  def redact(c: Column, pattern: String, token: String): Column =
    regexp_replace(c, pattern, token)

  /** Number of matches `redact` would replace — the audit counter every
    * scrub pass reports alongside the scrubbed text.
    */
  def redactionCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Scrub priority: most-specific patterns first, so the generic
    * `digitRun` cannot destroy the digits that `email`/`ssn`/`phone`
    * need to match. Names not listed here apply after these, in name
    * order (deterministic).
    */
  val piiPriority: Seq[String] = Seq("email", "ssn", "phone")

  /** Apply several named patterns — [[piiPriority]] order first, then
    * remaining names alphabetically — and report per-pattern hit counts:
    * returns (scrubbed, map(name -> count)). Counts are measured on the
    * ORIGINAL text so overlapping patterns don't hide each other's hits;
    * because specific patterns scrub before generic ones, every counted
    * specific hit is also actually redacted by its own pattern.
    */
  def piiScrub(c: Column, patterns: Map[String, String],
               token: String = "<PII>"): (Column, Column) = {
    val ordered = patterns.toSeq.sortBy { case (name, _) =>
      val i = piiPriority.indexOf(name)
      (if (i >= 0) i else piiPriority.length, name)
    }
    val scrubbed = ordered.foldLeft(c) { case (acc, (_, p)) =>
      redact(acc, p, token)
    }
    val counts = map(ordered.flatMap { case (name, p) =>
      Seq(lit(name), redactionCount(c, p))
    }: _*)
    (scrubbed, counts)
  }
}
