package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY §4/§7.3 "where custom Catalyst work is
  * warranted", item b): rewrite *recognizably associative* fold
  * expressions built by [[graft.plumba.ExprOps.foldCol]] into native
  * aggregates — the engine-native fast path the reference philosophy
  * prescribes ("use the engine when you can").
  *
  * Recognized shape:
  * {{{
  *   aggregate(                                  // ArrayAggregate
  *     array_sort(collect_list(<struct or case-when-struct>)),
  *     <literal zero>,
  *     (acc, x) -> acc + x.<field>,              // pure Add of one field
  *     acc -> acc)                               // identity finish
  * }}}
  * which is exactly `zero + sum(<field>)`: addition is commutative and
  * null-skipping in both forms, so the sort is irrelevant and the
  * rewrite is a pure win — the whole collect_list buffer (O(group) state)
  * disappears in favor of a streaming native Sum.
  *
  * Anything that does not match precisely (conditional folds like the
  * credit-card kernel, multi-field steps, non-identity finish) is left
  * untouched — the rule must never change semantics.
  *
  * Install via `spark.experimental.extraOptimizations ++= Seq(FoldToNativeAgg)`
  * or `GraftExtensions` (spark.sql.extensions).
  */
object FoldToNativeAgg extends Rule[LogicalPlan] {

  private object IdentityLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
        body.exprId == arg.exprId
      case _ => false
    }
  }

  /** Extracts the struct construction from collect_list's child,
    * tolerating the null-dropping `CASE WHEN notNull THEN struct END`
    * wrapper foldCol emits. */
  private object PackedStruct {
    def unapply(e: Expression): Option[CreateNamedStruct] = e match {
      case s: CreateNamedStruct => Some(s)
      case CaseWhen(Seq((_, s: CreateNamedStruct)), None) => Some(s)
      case _ => None
    }
  }

  private object SumStep {
    /** Matches `(acc, x) -> acc + x.field` (either operand order) and
      * returns the struct-field ordinal. */
    def unapply(e: Expression): Option[Int] = e match {
      case LambdaFunction(Add(l, r, _), Seq(acc: NamedLambdaVariable, x: NamedLambdaVariable), _) =>
        (l, r) match {
          case (a: NamedLambdaVariable, GetStructField(xx: NamedLambdaVariable, ord, _))
              if a.exprId == acc.exprId && xx.exprId == x.exprId => Some(ord)
          case (GetStructField(xx: NamedLambdaVariable, ord, _), a: NamedLambdaVariable)
              if a.exprId == acc.exprId && xx.exprId == x.exprId => Some(ord)
          case _ => None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ArraySort(
            ae @ AggregateExpression(cl: CollectList, _, false, None, _), _, _),
          zero: Literal,
          SumStep(ordinal),
          IdentityLambda()) if PackedStruct.unapply(cl.child).isDefined =>
      val s = PackedStruct.unapply(cl.child).get
      val field = s.valExprs(ordinal)
      val sum = AggregateExpression(Sum(field), ae.mode, isDistinct = false, None, NamedExpression.newExprId)
      // zero + sum(field); sum of an empty/all-null group is null ->
      // coalesce to the additive identity so the result is the bare zero
      // (fold over no rows == init).
      Add(zero, Coalesce(Seq(sum, Cast(Literal(0), sum.dataType))))
  }
}
