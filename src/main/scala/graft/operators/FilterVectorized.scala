package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A single filter condition, mirroring the reference engine's 5-tuple
  * `(tensor, op, value, use_inverted_index, negation)` filter conditions
  * (reference: muller/core/query/filter_vectorized.py:75-141).
  *
  * Supported ops: `> < >= <= == != CONTAINS BETWEEN LIKE`
  * (filter_vectorized.py:94-104). `negation` complements the single
  * condition's result (filter_vectorized.py:60-72).
  */
final case class Cond(
    tensor: String,
    op: String,
    value: Any,
    negation: Boolean = false)

/** Spark-native compiler for MULLER's flagship `filter_vectorized` query.
  *
  * Semantics preserved from the reference (see SURVEY.md §2.2):
  *   - connectors `AND` / `OR` are folded LEFT-TO-RIGHT with NO precedence
  *     (filter_vectorized.py:370-380,600-604): `a OR b AND c` == `(a OR b) AND c`.
  *   - `BETWEEN [lo, hi]` is a CLOSED interval (filter_vectorized.py:240-252).
  *   - `LIKE` takes a REGEX, matched anywhere in the string
  *     (filter_vectorized.py:58-63,437-465) → `rlike`.
  *   - `CONTAINS` is token containment; `"a||b"` is an OR of conjunctive
  *     token sets (complex_fuzzy_match, filter_vectorized.py:229-233).
  *   - `offset`/`limit` paginate the matched rows in stable row order
  *     (filter_vectorized.py:108-116,124-141).
  *
  * Everything compiles to Catalyst `Column` predicates so pushdown, column
  * pruning and whole-stage codegen apply; no driver-side materialization.
  */
object FilterVectorized {

  /** Tokenizer used for CONTAINS: whitespace split (the reference uses a
    * jieba-based tokenizer; our testdata corpus is space-separated tokens).
    */
  def tokens(c: Column): Column = split(c, " ")

  /** `CONTAINS` with complex_fuzzy_match semantics: query "a b||c" matches
    * rows containing (a AND b) OR (c). (filter_vectorized.py:141-158)
    */
  def containsPredicate(c: Column, query: String): Column = {
    val toks = tokens(c)
    val alternatives = query.split("\\|\\|").toSeq.map(_.trim).filter(_.nonEmpty)
    val alts = alternatives.map { alt =>
      alt.split("\\s+").toSeq.filter(_.nonEmpty)
        .map(t => array_contains(toks, t))
        .reduce(_ && _)
    }
    alts.reduce(_ || _)
  }

  /** Compile one condition tuple to a Catalyst predicate. */
  def compileCond(cond: Cond): Column = {
    val c = col(cond.tensor)
    val base = cond.op.toUpperCase match {
      case ">"  => c > lit(cond.value)
      case "<"  => c < lit(cond.value)
      case ">=" => c >= lit(cond.value)
      case "<=" => c <= lit(cond.value)
      case "==" => c === lit(cond.value)
      case "!=" => c =!= lit(cond.value)
      case "BETWEEN" => cond.value match {
        case Seq(lo, hi)      => c >= lit(lo) && c <= lit(hi)
        case (lo, hi)         => c >= lit(lo) && c <= lit(hi)
        case other => throw new IllegalArgumentException(
          s"BETWEEN expects [lo, hi], got $other")
      }
      case "LIKE"     => c.rlike(cond.value.toString)
      case "CONTAINS" => containsPredicate(c, cond.value.toString)
      case other => throw new IllegalArgumentException(s"unsupported op $other")
    }
    if (cond.negation) !base else base
  }

  /** Left-fold of conditions over AND/OR connectors, no precedence.
    * `connectors.length` must be `conds.length - 1`
    * (validated like filter_vectorized.py:193-208).
    */
  def predicate(conds: Seq[Cond], connectors: Seq[String]): Column = {
    require(conds.nonEmpty, "need at least one condition")
    require(connectors.length == conds.length - 1,
      s"need ${conds.length - 1} connectors, got ${connectors.length}")
    conds.tail.zip(connectors).foldLeft(compileCond(conds.head)) {
      case (acc, (c, conn)) => conn.toUpperCase match {
        case "AND" => acc && compileCond(c)
        case "OR"  => acc || compileCond(c)
        case other => throw new IllegalArgumentException(s"bad connector $other")
      }
    }
  }

  def apply(df: DataFrame, conds: Seq[Cond],
            connectors: Seq[String] = Nil): DataFrame =
    df.filter(predicate(conds, connectors))

  /** A V1 `sources.Filter` IMPLIED by the condition fold, for manifest
    * file skipping — every row the real predicate matches also matches
    * the returned filter, so pruning by it is sound. Untranslatable
    * conditions (CONTAINS/LIKE/negation/non-literal values) become
    * "unknown": under the left-fold, `unknown AND f` weakens to `f`
    * (still implied) while `unknown OR f` poisons to None (a row could
    * match via the unknown side alone). None = prune nothing.
    */
  def pruneFilter(conds: Seq[Cond],
                  connectors: Seq[String])
      : Option[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.{sources => sf}
    def one(c: Cond): Option[sf.Filter] =
      if (c.negation) None
      else c.op.toUpperCase match {
        case ">"  => Some(sf.GreaterThan(c.tensor, c.value))
        case "<"  => Some(sf.LessThan(c.tensor, c.value))
        case ">=" => Some(sf.GreaterThanOrEqual(c.tensor, c.value))
        case "<=" => Some(sf.LessThanOrEqual(c.tensor, c.value))
        case "==" => Some(sf.EqualTo(c.tensor, c.value))
        case "BETWEEN" => c.value match {
          case Seq(lo, hi) => Some(sf.And(
            sf.GreaterThanOrEqual(c.tensor, lo),
            sf.LessThanOrEqual(c.tensor, hi)))
          case (lo, hi) => Some(sf.And(
            sf.GreaterThanOrEqual(c.tensor, lo),
            sf.LessThanOrEqual(c.tensor, hi)))
          case _ => None
        }
        case _ => None
      }
    if (conds.isEmpty || connectors.length != conds.length - 1) None
    else conds.tail.zip(connectors).foldLeft(one(conds.head)) {
      case (acc, (c, conn)) =>
        val f = one(c)
        conn.toUpperCase match {
          case "AND" => (acc, f) match {
            case (Some(a), Some(b)) => Some(sf.And(a, b))
            case (a, b) => a.orElse(b)
          }
          case "OR" => for { a <- acc; b <- f } yield sf.Or(a, b)
          case _ => None
        }
    }
  }

  /** Paginated variant. The reference pages over rows in dataset order;
    * on Spark, stable pagination needs an explicit total order, so callers
    * pass the sort key (usually the table's natural key).
    */
  def paged(df: DataFrame, conds: Seq[Cond], connectors: Seq[String],
            sortCols: Seq[String], offset: Int, limit: Int): DataFrame = {
    val filtered = df.filter(predicate(conds, connectors))
      .orderBy(sortCols.map(col): _*)
    val off = if (offset > 0) filtered.offset(offset) else filtered
    if (limit >= 0) off.limit(limit) else off
  }
}
