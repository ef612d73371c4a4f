package org.apache.spark.sql.graftnative

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, HintInfo, LogicalPlan, BROADCAST}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Index-aware planning (SURVEY.md §4 "predicate routing scan-vs-index"):
  * `GraftIndexedContains` is a self-contained predicate that KNOWS where
  * its posting table lives; the optimizer rule [[IndexedContainsRewrite]]
  * replaces `Filter(graft_indexed_contains(...))` with a broadcast
  * LEFT-SEMI join against the (shard-pruned) posting table. If the rule
  * is not installed the predicate still evaluates correctly as a scan
  * (interpreted token containment) — the plan degrades, never the answer.
  * This mirrors the reference's per-predicate routing decision
  * (filter_vectorized.py:211-279) as a Catalyst rewrite instead of a
  * hand-rolled planner.
  */
case class GraftIndexedContains(
    text: Expression, query: Expression,
    indexPath: Expression, numShards: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, query, indexPath, numShards)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_indexed_contains"

  def queryString: String = query.eval().asInstanceOf[UTF8String].toString
  def indexPathString: String = indexPath.eval().asInstanceOf[UTF8String].toString
  def numShardsInt: Int = numShards.eval().asInstanceOf[Int]

  /** `"a b||c"` → Seq(Seq(a, b), Seq(c)) — OR of conjunctive token sets. */
  private lazy val alternatives: Seq[Seq[String]] =
    queryString.split("\\|\\|").toSeq.map(_.trim).filter(_.nonEmpty)
      .map(_.split("\\s+").toSeq.filter(_.nonEmpty))

  /** Scan fallback: exact complex_fuzzy_match semantics on the raw text. */
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) null
    else {
      val toks = t.asInstanceOf[UTF8String].toString
        .split(" ").filter(_.nonEmpty).toSet
      alternatives.exists(_.forall(toks.contains))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), query = newChildren(1),
      indexPath = newChildren(2), numShards = newChildren(3))
}

object GraftIndexedContains {
  /** Build the routed predicate as a Column. */
  def apply(text: Column, query: String, indexPath: String,
            numShards: Int): Column = {
    import org.apache.spark.sql.functions.lit
    ExpressionUtils.column(GraftIndexedContains(
      ExpressionUtils.expression(text),
      ExpressionUtils.expression(lit(query)),
      ExpressionUtils.expression(lit(indexPath)),
      ExpressionUtils.expression(lit(numShards))))
  }
}

/** Rewrites `Filter(..., graft_indexed_contains(text, q, path, shards))`
  * into `Join(child, postingIds, LEFT SEMI, child._uuid = id)` with a
  * broadcast hint — the posting-id set for a query is tiny relative to
  * the corpus. Other conjuncts stay in the Filter. Requires the child to
  * expose the hidden `_uuid` column (Graft snapshots do).
  */
case class IndexedContainsRewrite(spark: SparkSession)
  extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child)
        if child.output.exists(_.name == "_uuid") =>
      val (routed, rest) = splitConjunctivePredicates(cond)
        .partition(_.isInstanceOf[GraftIndexedContains])
      if (routed.isEmpty) f
      else {
        val uuid = child.output.find(_.name == "_uuid").get
        val joined = routed.foldLeft(child) { (p, e) =>
          val gic = e.asInstanceOf[GraftIndexedContains]
          val idx = graft.operators.InvertedIndex.load(spark, gic.indexPathString)
          val ids = graft.operators.InvertedIndex.complexFuzzyIds(
            idx, gic.queryString, Some(gic.numShardsInt))
          // splice the OPTIMIZED subplan: this rule runs in the
          // user-provided batch after the main optimizer batches, so an
          // analyzed subtree (e.g. its Deduplicate) would never be
          // rewritten and the planner would reject it
          val idsPlan = ids.queryExecution.optimizedPlan
          val idAttr = idsPlan.output.head
          // Broadcast only id sets provably small, judged from the
          // build-time stats sidecar read DRIVER-SIDE (modtime-cached):
          // a Catalyst rule must never launch a Spark job mid-optimization.
          // A common term on a huge corpus has millions–billions of
          // postings and force-broadcasting them would OOM the driver;
          // above the cap (or with no sidecar) the join is left unhinted —
          // AQE picks shuffle vs broadcast at runtime. A malformed conf
          // value falls back to the default instead of failing planning.
          val limit = spark.conf.getOption("graft.index.broadcastIdLimit")
            .flatMap(v => scala.util.Try(v.toLong).toOption)
            .getOrElse(graft.operators.InvertedIndex.defaultBroadcastIdLimit)
          val stats = graft.operators.InvertedIndex.loadStats(
            spark, gic.indexPathString)
          val hint = stats match {
            case Some(st) if graft.operators.InvertedIndex
              .statsBound(st, gic.queryString) <= limit =>
              JoinHint(None, Some(HintInfo(Some(BROADCAST))))
            case _ => JoinHint.NONE
          }
          Join(p, idsPlan, LeftSemi,
            Some(org.apache.spark.sql.catalyst.expressions.EqualTo(uuid, idAttr)),
            hint)
        }
        rest.reduceOption(org.apache.spark.sql.catalyst.expressions.And)
          .map(Filter(_, joined)).getOrElse(joined)
      }
  }
}

/** Installers: builder-time (`.withExtensions(new GraftSparkExtensions)` or
  * `spark.sql.extensions=org.apache.spark.sql.graftnative.GraftSparkExtensions`)
  * and post-hoc for an existing session (`GraftExtensions.install`).
  */
class GraftSparkExtensions
  extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(session => IndexedContainsRewrite(session))
    ext.injectOptimizerRule(session => MetadataAggregateRewrite(session))
    SqlFunctions.descriptions.foreach(ext.injectFunction)
  }
}

object GraftExtensions {
  def install(spark: SparkSession): Unit = {
    Seq(IndexedContainsRewrite(spark), MetadataAggregateRewrite(spark))
      .foreach { rule =>
        if (!spark.experimental.extraOptimizations.contains(rule))
          spark.experimental.extraOptimizations =
            spark.experimental.extraOptimizations :+ rule
      }
    SqlFunctions.install(spark)
  }
}
