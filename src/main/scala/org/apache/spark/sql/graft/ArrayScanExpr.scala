package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, LambdaFunction, NamedLambdaVariable, UnresolvedNamedLambdaVariable}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, AnyDataType, ArrayType, DataType}

/** `array_scan(arr, zero, (acc, x) -> step)` — the prefix-scan sibling of
  * Spark's built-in `aggregate`: folds left like `ArrayAggregate` but
  * returns the array of EVERY post-step accumulator state, one per input
  * element, in O(n).
  *
  * This exists because a scan expressed through `aggregate` has to build
  * its output list functionally — `concat(acc.out, array(elem))` copies
  * the accumulated list on every step, O(n²) per group. A scan is not
  * expressible in O(n) with Spark's built-in higher-order functions
  * (their lambdas are stateless per element), so this is preference
  * order (b) from the build contract: a custom Catalyst expression
  * where built-in composition genuinely cannot express the computation.
  * It plugs into the standard `HigherOrderFunction` analysis machinery
  * (lambda variable binding, `ResolveLambdaVariables`), so it works from
  * both the Column API ([[graft.plumba.ExprOps.scanListCol]]) and SQL
  * (registered as `array_scan` in [[graft.GraftExtensions]]). It lives
  * in this package because the `HigherOrderFunction` contract's
  * signature types (`AbstractDataType`, `AnyDataType`) are
  * `private[sql]`.
  *
  * Reference anchor: the `Expr.plumba.scan`-under-agg shape returns a
  * list per group (reference examples_scan.py:79–82); this makes that
  * shape linear-time on Spark.
  */
case class ArrayScanExpr(argument: Expression, zero: Expression, merge: Expression)
    extends Expression with HigherOrderFunction with CodegenFallback {

  override def prettyName: String = "array_scan"

  override def nullable: Boolean = argument.nullable

  // containsNull: a step may legitimately evaluate to null (e.g. the
  // caller's null-masking emits null elements), so be conservative
  override def dataType: DataType = ArrayType(merge.dataType, containsNull = true)

  override def arguments: Seq[Expression] = Seq(argument, zero)
  override def argumentTypes: Seq[AbstractDataType] = Seq(ArrayType, AnyDataType)
  override def functions: Seq[Expression] = Seq(merge)
  override def functionTypes: Seq[AbstractDataType] = Seq(AnyDataType)

  override def checkInputDataTypes(): TypeCheckResult = checkArgumentDataTypes() match {
    case TypeCheckResult.TypeCheckSuccess =>
      if (!zero.dataType.sameType(merge.dataType))
        TypeCheckResult.TypeCheckFailure(
          s"the accumulator type ${merge.dataType.catalogString} produced by the step function " +
            s"must match the zero type ${zero.dataType.catalogString} (add explicit casts in the step)")
      else TypeCheckResult.TypeCheckSuccess
    case failure => failure
  }

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): ArrayScanExpr = {
    // nullable=true for the accumulator: we cannot prove a step never
    // evaluates to null (same conservatism as the built-in aggregate)
    val ArrayType(elementType, containsNull) = argument.dataType: @unchecked
    copy(merge = f(merge, (zero.dataType, true) :: (elementType, containsNull) :: Nil))
  }

  @transient private lazy val LambdaFunction(
    _, Seq(accVar: NamedLambdaVariable, elemVar: NamedLambdaVariable), _) = merge: @unchecked

  override def eval(input: InternalRow): Any = {
    val arr = argument.eval(input).asInstanceOf[ArrayData]
    if (arr == null) {
      null
    } else {
      val mergeForEval = functionsForEval.head
      accVar.value.set(zero.eval(input))
      val n = arr.numElements()
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        elemVar.value.set(arr.get(i, elemVar.dataType))
        // copy: accumulator values may be mutable rows reused by eval
        val next = InternalRow.copyValue(mergeForEval.eval(input))
        accVar.value.set(next)
        out(i) = next
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def children: Seq[Expression] = Seq(argument, zero, merge)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ArrayScanExpr =
    copy(argument = newChildren(0), zero = newChildren(1), merge = newChildren(2))
}

object ArrayScanExpr {
  /** Column-level constructor: builds the unresolved two-argument lambda
    * from a Scala function the way `functions.aggregate` does, through
    * the analyzer's standard lambda-resolution path. */
  def scan(arr: Column, zero: Column, step: (Column, Column) => Column): Column = {
    val accVar = UnresolvedNamedLambdaVariable(Seq("acc_gscan"))
    val xVar = UnresolvedNamedLambdaVariable(Seq("x_gscan"))
    val body = ColumnBridge.expression(
      step(ColumnBridge.column(accVar), ColumnBridge.column(xVar)))
    ColumnBridge.column(ArrayScanExpr(
      ColumnBridge.expression(arr),
      ColumnBridge.expression(zero),
      LambdaFunction(body, Seq(accVar, xVar))))
  }
}
