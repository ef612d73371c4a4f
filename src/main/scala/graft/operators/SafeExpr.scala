package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.expr

/** Spark-native equivalent of MULLER's safe-eval string-query language
  * (reference: muller/core/query/safe_evaluator.py:46-218 — AST-whitelist
  * evaluator; surface documented in SURVEY.md §2.2).
  *
  * Supported, matching the reference whitelist:
  *   comparisons `== != < <= > >=` (incl. chained via and), `and/or/not`,
  *   `in` / `not in` over list literals, arithmetic `+ - * / %`,
  *   numeric/string/bool literals, parentheses.
  *
  * Instead of interpreting an AST row-at-a-time like the reference, we
  * VALIDATE the expression against the same whitelist and then translate it
  * to a Catalyst expression via `expr()` — so string queries run inside
  * whole-stage codegen with predicate pushdown, not a Python interpreter.
  *
  * Attribute access matches the reference whitelist
  * (safe_evaluator.py:46-84): `col.size`, `col.shape[k]`, `col.min`,
  * `col.max`, `col.mean` on array columns translate to
  * `size()/array_min()/array_max()/aggregate()` — still pure Catalyst.
  *
  * Blocked (like safe_evaluator.py:106-218): function calls, lambdas,
  * imports, other attributes, non-shape subscripts, comprehensions,
  * semicolons.
  */
object SafeExpr {

  private val keywords = Set("and", "or", "not", "in", "true", "false", "null")
  private val attrs = Set("size", "shape", "min", "max", "mean")

  private sealed trait Tok
  private case class Ident(s: String) extends Tok
  private case class Num(s: String) extends Tok
  private case class Str(s: String) extends Tok
  private case class Sym(s: String) extends Tok
  private case class Attr(col: String, attr: String, idx: Option[Int]) extends Tok

  private def tokenize(q: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    val n = q.length
    while (i < n) {
      val ch = q(i)
      if (ch.isWhitespace) i += 1
      else if (ch.isLetter || ch == '_') {
        val start = i
        while (i < n && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
        out += Ident(q.substring(start, i))
      } else if (ch.isDigit || (ch == '.' && i + 1 < n && q(i + 1).isDigit)) {
        val start = i
        while (i < n && (q(i).isDigit || q(i) == '.' || q(i) == 'e' ||
          q(i) == 'E' || ((q(i) == '+' || q(i) == '-') && i > start &&
            (q(i - 1) == 'e' || q(i - 1) == 'E')))) i += 1
        out += Num(q.substring(start, i))
      } else if (ch == '\'' || ch == '"') {
        val quoteCh = ch
        val sb = new StringBuilder
        i += 1
        while (i < n && q(i) != quoteCh) {
          if (q(i) == '\\' && i + 1 < n) { sb.append(q(i + 1)); i += 2 }
          else { sb.append(q(i)); i += 1 }
        }
        if (i >= n) throw new IllegalArgumentException(s"unterminated string in: $q")
        i += 1
        out += Str(sb.toString)
      } else {
        val two = if (i + 1 < n) q.substring(i, i + 2) else ""
        if (Set("==", "!=", "<=", ">=", "**", "//").contains(two)) {
          out += Sym(two); i += 2
        } else if ("<>+-*/%()[],.".indexOf(ch) >= 0) {
          out += Sym(ch.toString); i += 1
        } else throw new IllegalArgumentException(
          s"illegal character '$ch' in query: $q")
      }
    }
    out.toList
  }

  /** Validate tokens against the whitelist and translate to Spark SQL.
    *
    * `classLabels` carries label dictionaries for class-label columns
    * (reference htype `class_label`, class_names in tensor info): a string
    * literal compared against such a column — `label == 'cat'`,
    * `label in ['cat','dog']` — is coerced to its dictionary id exactly
    * like the reference's evaluator (muller/core/query/query.py:104-324).
    */
  /** Fold `col . attr` (and a trailing `[k]` for shape) into [[Attr]]
    * tokens; any other use of `.` or a subscript is blocked, mirroring the
    * reference's AST whitelist (Attribute allowed only for the five tensor
    * attributes, Subscript only on `shape`).
    */
  private def foldAttrs(toks: List[Tok], colSet: Set[String]): List[Tok] = {
    val arr = toks.toVector
    val out = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    while (i < arr.length) {
      arr(i) match {
        case Sym(".") =>
          val colName = out.lastOption match {
            case Some(Ident(c)) if colSet.contains(c) &&
              !keywords.contains(c.toLowerCase) => c
            case _ => throw new IllegalArgumentException(
              "attribute access is only allowed on dataset columns")
          }
          // a struct FIELD of the column wins over the attribute
          // whitelist: `group.tensor` addressing (reference query.py:86-101)
          arr.lift(i + 1) match {
            case Some(Ident(a)) if colSet.contains(s"$colName.$a") =>
              out.remove(out.length - 1)
              out += Ident(s"$colName.$a")
              i += 2
            case other =>
              val attr = other match {
                case Some(Ident(a)) if attrs.contains(a) => a
                case Some(Ident(a)) => throw new IllegalArgumentException(
                  s"attribute '.$a' is blocked; allowed: " +
                    s"${attrs.mkString(", ")} or a struct field")
                case _ => throw new IllegalArgumentException(
                  "dangling '.' in query")
              }
              val idx = (arr.lift(i + 2), arr.lift(i + 3), arr.lift(i + 4)) match {
                case (Some(Sym("[")), Some(Num(k)), Some(Sym("]")))
                    if attr == "shape" =>
                  i += 3
                  Some(k.toDouble.toInt)
                case (Some(Sym("[")), _, _) =>
                  throw new IllegalArgumentException(
                    s"subscripts are only allowed on .shape, not .$attr")
                case _ => None
              }
              if (attr == "shape" && idx.isEmpty)
                throw new IllegalArgumentException(
                  ".shape must be indexed, e.g. col.shape[0]")
              out.remove(out.length - 1)
              out += Attr(colName, attr, idx)
              i += 2
          }
        case Sym("[") =>
          // a '[' directly after a column is an arbitrary subscript — block
          out.lastOption match {
            case Some(Ident(c)) if colSet.contains(c) =>
              throw new IllegalArgumentException(
                s"subscript on '$c' is blocked; only .shape[k] is allowed")
            case _ => out += arr(i); i += 1
          }
        case t => out += t; i += 1
      }
    }
    out.toList
  }

  /** Backtick-quote a (possibly dotted struct-path) column reference. */
  private def quote(name: String): String =
    name.split('.').map(p => s"`$p`").mkString(".")

  /** SQL for an attribute token — pure built-in Catalyst functions. */
  private def attrSql(a: Attr): String = {
    val c = quote(a.col)
    a.attr match {
      case "size" => s"size($c)"
      case "shape" =>
        val k = a.idx.get
        require(k >= 0 && k <= 8, s"shape index $k out of range")
        // dim k of a nested array = size after k first-element descents
        s"size($c${"[0]" * k})"
      case "min" => s"array_min($c)"
      case "max" => s"array_max($c)"
      case "mean" =>
        // CASE guards the empty tensor: 0/0 would abort the whole job
        // under ANSI mode; NULL matches DuckDB's list_avg([]) and the
        // branch never evaluates the division (CaseWhen is lazy)
        s"(CASE WHEN size($c) = 0 THEN NULL ELSE " +
          s"aggregate($c, cast(0 as double), (acc, x) -> acc + cast(x as double)) / size($c) END)"
    }
  }

  def toSql(query: String, columns: Seq[String],
            classLabels: Map[String, Seq[String]] = Map.empty): String = {
    val colSet = columns.toSet
    val toks = foldAttrs(tokenize(query), colSet)
    if (toks.isEmpty) throw new IllegalArgumentException("empty query")
    val sb = new StringBuilder
    var prevIdent = false
    // class-label coercion context: set while the right-hand side of a
    // comparison / IN-list against a class-label column is being emitted
    var labelCtx: Option[Seq[String]] = None
    var inList = false
    val compareOps = Set("==", "!=", "<", "<=", ">", ">=")
    toks.foreach { t =>
      val piece = t match {
        case a: Attr =>
          prevIdent = false; labelCtx = None
          attrSql(a)
        case Ident(s) if keywords.contains(s.toLowerCase) =>
          prevIdent = false
          if (s.toLowerCase != "in") { labelCtx = None; inList = false }
          s.toUpperCase
        case Ident(s) =>
          if (!colSet.contains(s)) throw new IllegalArgumentException(
            s"unknown identifier '$s' (not a column); function calls and " +
              "names outside the dataset schema are blocked")
          prevIdent = true
          labelCtx = classLabels.get(s)
          quote(s)
        case Num(s) => prevIdent = false; s
        case Str(s) =>
          prevIdent = false
          labelCtx match {
            case Some(names) =>
              val id = names.indexOf(s)
              if (id < 0) throw new IllegalArgumentException(
                s"'$s' is not one of the class labels ${names.mkString(",")}")
              if (!inList) labelCtx = None
              id.toString
            case None => "'" + s.replace("'", "\\'") + "'"
          }
        case Sym("(") =>
          if (prevIdent) throw new IllegalArgumentException(
            "function calls are blocked in safe query expressions")
          prevIdent = false; "("
        case Sym("==") => prevIdent = false; "="
        case Sym("**") | Sym("//") => throw new IllegalArgumentException(
          "operators ** and // are not supported; use explicit arithmetic")
        case Sym("[") => prevIdent = false; inList = true; "("
        case Sym("]") => prevIdent = false; inList = false; labelCtx = None; ")"
        case Sym(s) =>
          prevIdent = false
          if (!compareOps.contains(s) && s != ",") { labelCtx = None }
          if (s == "==") "=" else s
      }
      sb.append(piece).append(' ')
    }
    sb.toString.trim
  }

  /** Every addressable column path: top-level names plus dotted paths
    * into struct columns (tensor groups).
    */
  private def dottedPaths(schema: org.apache.spark.sql.types.StructType,
                          prefix: String = ""): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      name +: (f.dataType match {
        case st: org.apache.spark.sql.types.StructType => dottedPaths(st, name)
        case _ => Nil
      })
    }

  /** Compile a safe string query into a Catalyst predicate for `df`. */
  def compile(df: DataFrame, query: String,
              classLabels: Map[String, Seq[String]] = Map.empty): Column =
    expr(toSql(query, dottedPaths(df.schema), classLabels))

  def filter(df: DataFrame, query: String,
             classLabels: Map[String, Seq[String]] = Map.empty): DataFrame =
    df.filter(compile(df, query, classLabels))
}
