package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Dictionary-based CJK tokenizer with stop-word and case-sensitivity
  * options — the Spark-native re-design of the reference's jieba tokenizer
  * (muller/core/query/inverted_index_vectorized.py:121-158: lowercase
  * unless case_sensitive, user dict = compulsory words kept as units,
  * stop words filtered AFTER segmentation).
  *
  * Semantics:
  *   - `caseSensitive = false` (reference default) lowercases first.
  *   - Non-Han runs split on whitespace (the corpus contract shared with
  *     [[graft.functions.TextFunctions.tokens]]).
  *   - Han runs are segmented by jieba's DAG MAX-PROBABILITY path
  *     (`useDag = true`, the default — the public algorithm jieba's
  *     precise mode runs before its HMM pass): every dictionary word
  *     starting at each position is a DAG edge, a right-to-left DP picks
  *     the route maximizing Σ log(freq(w)/total), OOV characters ride
  *     along as freq-1 single-char words, and score ties break toward the
  *     LONGER word exactly like jieba's `max()` over (score, end) tuples.
  *     Words without an explicit frequency weigh `defaultFreq` (100), so
  *     a dictionary word always beats spelling the same span with an OOV
  *     character — which is what separates 研究/生命/起源 from FMM's
  *     研究生/命/起源 on the classic ambiguous string.
  *   - `hmm = true` adds jieba's OOV pass (jieba `cut(..., HMM=True)`,
  *     the reference's default — inverted_index_vectorized.py:132):
  *     consecutive single-char route outputs are buffered exactly like
  *     jieba's `__cut_DAG`, and a multi-char buffer that is not itself a
  *     dictionary word runs a 4-state BMES Viterbi with jieba's public
  *     `finalseg` start/transition model, so multi-char OOV words (names,
  *     neologisms) come out as words instead of single characters. The
  *     shipped emission model is uniform — the per-character emission
  *     table is DATA, not algorithm (jieba's prob_emit holds ~30k
  *     characters), and with uniform emissions the Viterbi is driven by
  *     the transition model's word-shape prior (pairs, then triples).
  *     `hmm = false` (the default) is the oracle-stable HMM=False path.
  *   - `useDag = false` keeps forward maximum matching (longest
  *     dictionary word at each position wins) — the cheaper greedy mode.
  *   - `stopWords` are dropped after segmentation (applies to Han and
  *     Latin tokens alike, like the reference's full_stop_words).
  *
  * Tokens come out in text order. CodegenFallback: segmentation is
  * branch-heavy scalar work with no array-construction win from codegen;
  * the expression still runs inside whole-stage-codegen'd stages via the
  * fallback path, and the hot whitespace path keeps its codegen'd
  * formulation.
  */
case class DictTokens(child: Expression, dict: Seq[String],
                      stopWords: Seq[String], caseSensitive: Boolean,
                      freqs: Seq[Long], useDag: Boolean, hmm: Boolean,
                      emitP: Map[String, Seq[Double]] = Map.empty)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(freqs.isEmpty || freqs.length == dict.length,
    s"freqs (${freqs.length}) must be empty or parallel to dict (${dict.length})")
  require(emitP.values.forall(_.length == 4),
    "emitP entries must carry exactly 4 log-probs (B, M, E, S)")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_dict_tokens"

  private def fold(w: String): String = if (caseSensitive) w else w.toLowerCase

  @transient private lazy val dictFreq: java.util.HashMap[String, Long] = {
    val m = new java.util.HashMap[String, Long]()
    dict.zipWithIndex.foreach { case (w, i) =>
      val f = if (freqs.isEmpty) DictTokens.defaultFreq
              else math.max(freqs(i), 1L)
      m.put(fold(w), f)
    }
    m
  }
  @transient private lazy val maxWordLen: Int =
    if (dict.isEmpty) 0 else dict.map(_.length).max
  // jieba's logtotal: log of the dictionary's total frequency mass
  @transient private lazy val logTotal: Double = {
    var t = 0L
    dictFreq.values.forEach(f => t += f)
    math.log(math.max(t, 1L).toDouble)
  }
  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopWords.foreach(w => s.add(fold(w)))
    s
  }

  private def isHan(ch: Char): Boolean =
    Character.UnicodeScript.of(ch) == Character.UnicodeScript.HAN

  /** Emit the Han run `text[start, end)` word by word. With `hmm`,
    * consecutive single-char DAG outputs buffer and re-segment through
    * the BMES Viterbi — the exact `__cut_DAG` buffering jieba runs: a
    * one-char buffer emits as-is, a multi-char buffer that IS a dict
    * word emits per character (jieba's behavior for frequency-0 dict
    * prefixes), anything else goes to [[DictTokens.viterbiCut]].
    */
  private def segmentHan(text: String, start: Int, end: Int,
                         emit: String => Unit): Unit =
    if (!useDag) segmentFmm(text, start, end, emit)
    else if (!hmm) segmentDag(text, start, end, emit)
    else {
      val buf = new StringBuilder
      def flush(): Unit = {
        if (buf.length == 1) emit(buf.toString)
        else if (buf.length > 1) {
          val s = buf.toString
          if (!dictFreq.containsKey(s)) DictTokens.viterbiCut(s, emit, emitP)
          else { var k = 0; while (k < s.length) {
            emit(s.substring(k, k + 1)); k += 1 } }
        }
        buf.setLength(0)
      }
      segmentDag(text, start, end, w =>
        if (w.length == 1) buf.append(w)
        else { flush(); emit(w) })
      flush()
    }

  private def segmentFmm(text: String, start: Int, end: Int,
                         emit: String => Unit): Unit = {
    var j = start
    while (j < end) {
      // forward maximum matching: longest dict word at j, else 1 char
      var m = math.min(maxWordLen, end - j)
      var len = 1
      while (m >= 2 && len == 1) {
        if (dictFreq.containsKey(text.substring(j, j + m))) len = m
        m -= 1
      }
      emit(text.substring(j, j + len))
      j += len
    }
  }

  private def segmentDag(text: String, start: Int, end: Int,
                         emit: String => Unit): Unit = {
    val l = end - start
    if (l <= 0) return
    // route(i) = best log-prob of segmenting [i, l); choice(i) = its first
    // word's end. Right-to-left DP over DAG edges (dict words + the
    // always-present single char), ties toward the longer word.
    val route = new Array[Double](l + 1)
    val choice = new Array[Int](l + 1)
    route(l) = 0.0
    var i = l - 1
    while (i >= 0) {
      var best = Double.NegativeInfinity
      var bestEnd = i + 1
      val jMax = math.min(l, i + math.max(maxWordLen, 1))
      var j = i + 1
      while (j <= jMax) {
        val f: Long =
          if (j == i + 1) {
            val v = dictFreq.getOrDefault(
              text.substring(start + i, start + j), 0L)
            if (v == 0L) 1L else v // OOV single char rides as freq 1
          } else {
            val v = dictFreq.getOrDefault(
              text.substring(start + i, start + j), 0L)
            if (v == 0L) -1L else v // multi-char edges must be dict words
          }
        if (f > 0) {
          val score = math.log(f.toDouble) - logTotal + route(j)
          if (score > best || (score == best && j > bestEnd)) {
            best = score; bestEnd = j
          }
        }
        j += 1
      }
      route(i) = best
      choice(i) = bestEnd
      i -= 1
    }
    var p = 0
    while (p < l) {
      emit(text.substring(start + p, start + choice(p)))
      p = choice(p)
    }
  }

  override protected def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].toString
    val text = if (caseSensitive) raw else raw.toLowerCase
    val out = scala.collection.mutable.ArrayBuffer[UTF8String]()
    def emit(tok: String): Unit =
      if (tok.nonEmpty && !stopSet.contains(tok))
        out += UTF8String.fromString(tok)
    val n = text.length
    var i = 0
    var wordStart = -1 // current non-Han word start, -1 = none
    def flushWord(end: Int): Unit = {
      if (wordStart >= 0) emit(text.substring(wordStart, end))
      wordStart = -1
    }
    while (i < n) {
      val ch = text.charAt(i)
      if (isHan(ch)) {
        flushWord(i)
        var runEnd = i
        while (runEnd < n && isHan(text.charAt(runEnd))) runEnd += 1
        segmentHan(text, i, runEnd, emit)
        i = runEnd
      } else if (Character.isWhitespace(ch)) {
        flushWord(i)
        i += 1
      } else {
        if (wordStart < 0) wordStart = i
        i += 1
      }
    }
    flushWord(n)
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DictTokens {
  /** Frequency of a dictionary word with no explicit count: high enough
    * that one dict word always outweighs an OOV char (freq 1), low enough
    * that explicit per-word counts (a real jieba dict) dominate.
    */
  val defaultFreq: Long = 100L

  def apply(text: Column, dict: Seq[String], stopWords: Seq[String],
            caseSensitive: Boolean): Column =
    apply(text, dict, stopWords, caseSensitive, Nil, useDag = true)

  def apply(text: Column, dict: Seq[String], stopWords: Seq[String],
            caseSensitive: Boolean, freqs: Seq[Long], useDag: Boolean): Column =
    apply(text, dict, stopWords, caseSensitive, freqs, useDag, hmm = false)

  def apply(text: Column, dict: Seq[String], stopWords: Seq[String],
            caseSensitive: Boolean, freqs: Seq[Long], useDag: Boolean,
            hmm: Boolean): Column =
    apply(text, dict, stopWords, caseSensitive, freqs, useDag, hmm, Map.empty)

  def apply(text: Column, dict: Seq[String], stopWords: Seq[String],
            caseSensitive: Boolean, freqs: Seq[Long], useDag: Boolean,
            hmm: Boolean, emitP: Map[String, Seq[Double]]): Column =
    ExpressionUtils.column(DictTokens(
      ExpressionUtils.expression(text), dict, stopWords, caseSensitive,
      freqs, useDag, hmm, emitP))

  /** Derive a BMES emission table from a frequency dictionary — the
    * maximum-likelihood construction jieba's `prob_emit` encodes (char
    * occurrence counts per BMES tag over a segmented corpus), with the
    * dictionary standing in for the corpus: a word of ≥ 2 code points
    * tags its first char B, interior chars M, last char E; a
    * single-char word tags S — each weighted by the word's frequency
    * (a real jieba-style dict carries corpus counts, so the weighting
    * IS the corpus statistic). Add-α smoothing over the dictionary's
    * character vocabulary keeps every (char, state) log-prob finite,
    * so the transition prior stays relevant for unseen pairings (see
    * [[viterbiCut]] on why jieba's MIN_FLOAT floor is a precision
    * artifact this model does not copy). A dictionary with no
    * single-char words leaves S flat at 1/V — real frequency dicts
    * (jieba's dict.txt format) carry thousands of single-char entries,
    * so S is only degenerate on toy word lists.
    *
    * The emission model stays DATA, like the dictionary: this is the
    * mechanism for users who hold only a word list; a user holding
    * jieba's actual `prob_emit` table passes it directly as
    * `emissions` and gets jieba-exact OOV boundaries.
    */
  def deriveEmitP(dict: Seq[String], freqs: Seq[Long] = Nil,
                  alpha: Double = 0.5): Map[String, Seq[Double]] = {
    require(freqs.isEmpty || freqs.length == dict.length,
      s"freqs (${freqs.length}) must be empty or parallel to dict (${dict.length})")
    val counts = scala.collection.mutable.Map[String, Array[Double]]()
    def add(cp: Int, st: Int, f: Double): Unit =
      counts.getOrElseUpdate(new String(Character.toChars(cp)),
        Array.fill(4)(0.0))(st) += f
    dict.zipWithIndex.foreach { case (w, i) =>
      val f = (if (freqs.isEmpty) defaultFreq
               else math.max(freqs(i), 1L)).toDouble
      val cps = w.codePoints.toArray // surrogate-safe: one tag per char
      if (cps.length == 1) add(cps(0), S, f)
      else if (cps.length >= 2) {
        add(cps(0), B, f); add(cps(cps.length - 1), E, f)
        var k = 1
        while (k < cps.length - 1) { add(cps(k), M, f); k += 1 }
      }
    }
    val v = counts.size.toDouble
    if (v == 0) return Map.empty
    val totals = new Array[Double](4)
    counts.values.foreach { a =>
      var s = 0; while (s < 4) { totals(s) += a(s); s += 1 }
    }
    counts.iterator.map { case (c, a) =>
      c -> (0 until 4).map(s =>
        math.log((a(s) + alpha) / (totals(s) + alpha * v)))
    }.toMap
  }

  // ---- BMES Viterbi over OOV spans (jieba finalseg) -----------------------
  // The 4-state start/transition log-probabilities below are jieba's
  // published `finalseg` model (prob_start.py / prob_trans.py) — small
  // public constants, same standing as the MPEG bitrate tables. Missing
  // transitions (e.g. B→B) are impossible and carry jieba's MIN_FLOAT.

  private final val B = 0; private final val M = 1
  private final val E = 2; private final val S = 3
  private final val MinLog = -3.14e100

  private val startP: Array[Double] =
    Array(-0.26268660809250016, MinLog, MinLog, -1.4652633398537678)

  private val transP: Array[Array[Double]] = {
    val t = Array.fill(4, 4)(MinLog)
    t(B)(E) = -0.51082562376599072; t(B)(M) = -0.91629073187415511
    t(E)(B) = -0.58971497368545132; t(E)(S) = -0.80852504746699476
    t(M)(E) = -0.33344856811948514; t(M)(M) = -1.2603623820268226
    t(S)(B) = -0.72119656546698418; t(S)(S) = -0.66586314487982712
    t
  }

  /** Segment an OOV Han span by max-likelihood BMES state path. With no
    * emission table, uniform emissions (constant per state) cancel in
    * the argmax, so the path is the transition model's word-shape prior.
    * A supplied `emitP` — jieba's `prob_emit` format, char → 4 log-probs
    * for (B, M, E, S) — slots in additively at each (i, state); a char
    * absent from the table carries no evidence and scores 0.0 in every
    * state, so unknown spans follow the transition prior. (jieba puts
    * MIN_FLOAT = -3.14e100 there, but only because its per-STATE maps
    * can hold a char in some states and not others; at that magnitude
    * the finite transition terms fall below one double ulp and the path
    * degenerates to the tie-break — a precision artifact, not a model
    * choice, and our per-CHAR format cannot express the partial case.)
    * End state is forced to E or S (a word cannot end mid-character),
    * ties resolved toward S exactly like jieba's `max()` over ('E','S').
    */
  private[graftnative] def viterbiCut(s: String, emit: String => Unit)
      : Unit = viterbiCut(s, emit, Map.empty)

  private[graftnative] def viterbiCut(s: String, emit: String => Unit,
                                      emitP: Map[String, Seq[Double]])
      : Unit = {
    val n = s.length
    if (n == 0) return
    if (n == 1) { emit(s); return }
    def emitLp(i: Int, st: Int): Double =
      emitP.get(s.substring(i, i + 1)) match {
        case Some(lps) => lps(st)
        case None => 0.0 // no evidence: the transition prior decides
      }
    val dp = Array.ofDim[Double](n, 4)
    val bp = Array.ofDim[Int](n, 4)
    var st = 0
    while (st < 4) { dp(0)(st) = startP(st) + emitLp(0, st); st += 1 }
    var i = 1
    while (i < n) {
      st = 0
      while (st < 4) {
        var best = Double.NegativeInfinity
        var arg = 0
        var pr = 0
        while (pr < 4) {
          val c = dp(i - 1)(pr) + transP(pr)(st)
          if (c > best) { best = c; arg = pr }
          pr += 1
        }
        dp(i)(st) = best + emitLp(i, st)
        bp(i)(st) = arg
        st += 1
      }
      i += 1
    }
    val states = new Array[Int](n)
    states(n - 1) = if (dp(n - 1)(S) >= dp(n - 1)(E)) S else E
    i = n - 1
    while (i > 0) { states(i - 1) = bp(i)(states(i)); i -= 1 }
    var begin = 0
    i = 0
    while (i < n) {
      states(i) match {
        case B => begin = i
        case E => emit(s.substring(begin, i + 1))
        case S => emit(s.substring(i, i + 1))
        case _ => () // M: inside a word
      }
      i += 1
    }
  }
}
