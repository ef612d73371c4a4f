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
  *   - Han runs are segmented by forward maximum matching against `dict`
  *     (longest dictionary word at each position wins); characters not
  *     starting any dictionary word emit as single characters — jieba's
  *     precise mode without the HMM OOV model.
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
                      stopWords: Seq[String], caseSensitive: Boolean)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_dict_tokens"

  @transient private lazy val dictSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    dict.foreach(w => s.add(if (caseSensitive) w else w.toLowerCase))
    s
  }
  @transient private lazy val maxWordLen: Int =
    if (dict.isEmpty) 0 else dict.map(_.length).max
  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopWords.foreach(w => s.add(if (caseSensitive) w else w.toLowerCase))
    s
  }

  private def isHan(ch: Char): Boolean =
    Character.UnicodeScript.of(ch) == Character.UnicodeScript.HAN

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
        var j = i
        while (j < runEnd) {
          // forward maximum matching: longest dict word at j, else 1 char
          var m = math.min(maxWordLen, runEnd - j)
          var len = 1
          while (m >= 2 && len == 1) {
            if (dictSet.contains(text.substring(j, j + m))) len = m
            m -= 1
          }
          emit(text.substring(j, j + len))
          j += len
        }
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
  def apply(text: Column, dict: Seq[String], stopWords: Seq[String],
            caseSensitive: Boolean): Column =
    ExpressionUtils.column(DictTokens(
      ExpressionUtils.expression(text), dict, stopWords, caseSensitive))
}
