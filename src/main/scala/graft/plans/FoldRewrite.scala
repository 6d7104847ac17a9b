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

  /** Extracts the struct construction from collect_list's child plus the
    * null-drop guard of the `CASE WHEN notNull THEN struct END` wrapper
    * foldCol emits (None when unguarded). The guard must be inspected by
    * the caller: it is an AND of IsNotNull over ALL selected value
    * columns, so a rewrite to a single-field native aggregate is only
    * sound when the guard covers exactly that field — otherwise the fold
    * drops rows the native aggregate would keep. */
  private object PackedStruct {
    def unapply(e: Expression): Option[(CreateNamedStruct, Option[Expression])] = e match {
      case s: CreateNamedStruct => Some((s, None))
      case CaseWhen(Seq((pred, s: CreateNamedStruct)), None) => Some((s, Some(pred)))
      case _ => None
    }
  }

  /** True iff every conjunct of the null-drop guard is IsNotNull of the
    * single field the step consumes — then the native aggregate's own
    * null-skipping is exactly the fold's row-drop policy. */
  private def guardCoversOnly(guard: Option[Expression], field: Expression): Boolean =
    guard.forall { g =>
      splitConjuncts(g).forall {
        case IsNotNull(e) => e.semanticEquals(field)
        case _ => false
      }
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Which associative reduction a step lambda encodes. */
  private sealed trait StepKind
  private case object SumKind extends StepKind
  private case object MaxKind extends StepKind
  private case object MinKind extends StepKind

  private object AssocStep {
    private def accAndField(
        l: Expression, r: Expression,
        acc: NamedLambdaVariable, x: NamedLambdaVariable): Option[Int] =
      (l, r) match {
        case (a: NamedLambdaVariable, GetStructField(xx: NamedLambdaVariable, ord, _))
            if a.exprId == acc.exprId && xx.exprId == x.exprId => Some(ord)
        case (GetStructField(xx: NamedLambdaVariable, ord, _), a: NamedLambdaVariable)
            if a.exprId == acc.exprId && xx.exprId == x.exprId => Some(ord)
        case _ => None
      }

    /** Matches `(acc, x) -> acc + x.field`, `greatest(acc, x.field)`,
      * or `least(acc, x.field)` (either operand order; + is commutative,
      * greatest/least are symmetric) and returns (kind, field ordinal). */
    def unapply(e: Expression): Option[(StepKind, Int)] = e match {
      case LambdaFunction(body, Seq(acc: NamedLambdaVariable, x: NamedLambdaVariable), _) =>
        body match {
          case Add(l, r, _) => accAndField(l, r, acc, x).map(SumKind -> _)
          case Greatest(Seq(l, r)) => accAndField(l, r, acc, x).map(MaxKind -> _)
          case Least(Seq(l, r)) => accAndField(l, r, acc, x).map(MinKind -> _)
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
          AssocStep(kind, ordinal),
          IdentityLambda()) if {
            PackedStruct.unapply(cl.child).exists { case (s, guard) =>
              // Sound only when the null-drop guard matches the one field
              // the step reads: a multi-value-column fold drops a row when
              // ANY selected column is null, which Sum/Max/Min(field)
              // would keep — never rewrite those.
              guardCoversOnly(guard, s.valExprs(ordinal)) &&
              // UNGUARDED Sum of a nullable field is NOT rewritable: the
              // hand-built fold computes Add(acc, null) which poisons the
              // accumulator to NULL, while native Sum skips nulls.
              // (foldCol always emits the guard; Greatest/Least skip
              // nulls exactly like Max/Min, so they stay rewritable.)
              (guard.isDefined || kind != SumKind || !s.valExprs(ordinal).nullable)
            }
          } =>
      val (s, _) = PackedStruct.unapply(cl.child).get
      val field = s.valExprs(ordinal)
      def agg(f: AggregateFunction) =
        AggregateExpression(f, ae.mode, isDistinct = false, None, NamedExpression.newExprId)
      kind match {
        case SumKind =>
          // zero + sum(field); sum of an empty/all-null group is null ->
          // coalesce to the additive identity so the result is the bare
          // zero (fold over no rows == init). Sum widens integral inputs
          // (int -> long) and this rule runs post-analysis where no
          // implicit casts are inserted, so cast the result back to the
          // field type the fold's Add was resolved against.
          val sum = agg(Sum(field))
          val sumAsField =
            if (sum.dataType == field.dataType) sum else Cast(sum, field.dataType)
          Add(zero, Coalesce(Seq(sumAsField, Cast(Literal(0), field.dataType))))
        case MaxKind =>
          // Greatest skips nulls, so an empty group's null max falls
          // back to the zero — exactly fold-over-nothing.
          Greatest(Seq(zero, agg(Max(field))))
        case MinKind =>
          Least(Seq(zero, agg(Min(field))))
      }
  }
}
