package org.apache.spark.sql.graftnative

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Metadata-only aggregates over graft tables (Delta's "metadata query"
  * optimization as a Catalyst rule): an ungrouped, unfiltered
  * `COUNT(*)` / `MIN(col)` / `MAX(col)` over a graft relation is
  * answered from the MANIFEST — per-file row counts and skipping stats
  * captured at write time — and the whole subtree collapses to a
  * [[LocalRelation]] with one pre-computed row. At 100 TB that turns a
  * full-corpus scan into a driver-side metadata read.
  *
  * Soundness gates, per aggregate:
  *  - `COUNT(*)` (also `COUNT(1)`, non-distinct, unfiltered) uses
  *    [[graft.format.GraftRelation.metadataCount]] — exact even with
  *    outstanding updates/tombstones (updates never mint or retire
  *    row uuids; each tombstoned uuid was live exactly once).
  *  - `MIN`/`MAX` of a plain column uses `metadataMinMax`, which
  *    REFUSES (rule leaves the plan alone) whenever metadata cannot
  *    speak for the data: outstanding updates or tombstones, any
  *    file without complete stats for the column, un-normalized stat
  *    keys under a rename chain, or a non-comparable column type.
  *  - Any Filter between the aggregate and the relation, any grouping,
  *    DISTINCT, or an aggregate FILTER clause disables the rewrite.
  *
  * The rewrite runs in the user-rule batch after the main optimizer
  * batches, so it sees the pruned shape `Aggregate → Project(attrs) →
  * LogicalRelation(GraftRelation)`.
  */
case class MetadataAggregateRewrite(spark: SparkSession)
  extends Rule[LogicalPlan] {

  /** The graft relation under the aggregate, looked through pure
    * column-pruning Projects (attribute-only; an empty list is
    * COUNT(*)'s prune-everything shape). */
  private def relationOf(p: LogicalPlan): Option[graft.format.GraftRelation] =
    p match {
      case lr: LogicalRelation => lr.relation match {
        case g: graft.format.GraftRelation => Some(g)
        case _ => None
      }
      case Project(projList, child)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        relationOf(child)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate if agg.groupingExpressions.isEmpty &&
        agg.aggregateExpressions.nonEmpty &&
        relationOf(agg.child).isDefined =>
      val rel = relationOf(agg.child).get
      // one metadata count per rewrite, however many COUNT columns
      lazy val count = rel.metadataCount
      val values = agg.aggregateExpressions.map(metadataValue(rel, count, _))
      if (values.exists(_.isEmpty)) agg // something unprovable: keep the scan
      else
        LocalRelation(agg.output,
          Seq(InternalRow.fromSeq(values.map(_.get))))
  }

  /** The CATALYST value this output column provably takes (Some(null) =
    * provable NULL), or None = not provable → whole rewrite aborts.
    * Presentation wrappers over provable aggregates — `CAST(MIN(x))`,
    * `COALESCE(MIN(x), 0)`, `MIN(x) + 0`, arbitrarily nested — fold by
    * substituting each aggregate with its metadata value as a literal
    * and evaluating the remaining DETERMINISTIC expression once on the
    * driver, so wrapping an aggregate does not silently bring the
    * 100 TB scan back.
    */
  private def metadataValue(rel: graft.format.GraftRelation, count: => Long,
                            ne: NamedExpression): Option[Any] =
    ne match {
      case Alias(expr, _) =>
        var provable = true
        val substituted = expr.transformUp {
          case ae: AggregateExpression =>
            aggValue(rel, count, ae) match {
              case Some((v, dt)) =>
                org.apache.spark.sql.catalyst.expressions.Literal
                  .create(v.orNull, dt)
              case None => provable = false; ae
            }
        }
        // never run USER code inside the optimizer: a ScalaUDF (or a
        // python UDF) is deterministic-by-default yet may be slow, do
        // I/O, or be wrongly marked — freezing its plan-time result
        // into the LocalRelation would silently change semantics. Only
        // built-in deterministic expressions fold; everything else
        // keeps the scan and evaluates at execution time as before.
        def runsUserCode(e: org.apache.spark.sql.catalyst.expressions.Expression)
            : Boolean = e.exists {
          case _: org.apache.spark.sql.catalyst.expressions.ScalaUDF => true
          case _: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => true
          case x => x.getClass.getName.contains("PythonUDF")
        }
        if (!provable || !substituted.deterministic ||
            runsUserCode(substituted)) None
        else
          try Some(substituted.eval(InternalRow.empty))
          catch { case scala.util.control.NonFatal(_) => None }
      case _ => None
    }

  /** (external value — None = SQL NULL — and its pre-cast type), or
    * None when metadata cannot prove this aggregate. */
  private def aggValue(rel: graft.format.GraftRelation, count: => Long,
                       ae: AggregateExpression)
      : Option[(Option[Any], org.apache.spark.sql.types.DataType)] = {
    if (ae.isDistinct || ae.filter.isDefined) return None
    ae.aggregateFunction match {
      case Count(Seq(Literal(v, _))) if v != null =>
        Some((Some(count), org.apache.spark.sql.types.LongType))
      case Min(a: AttributeReference) =>
        rel.metadataMinMax(a.name).map(mm => (Option(mm._1), a.dataType))
      case Max(a: AttributeReference) =>
        rel.metadataMinMax(a.name).map(mm => (Option(mm._2), a.dataType))
      case _ => None
    }
  }
}
