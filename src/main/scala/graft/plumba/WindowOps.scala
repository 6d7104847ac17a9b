package graft.plumba

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Associative-scan fast paths (SURVEY §7.2 step 5, §7.3).
  *
  * When the kernel is a known associative reduction (max/min/sum/count/
  * product), the reference's ordered scan is exactly a running window
  * aggregate — `rowsBetween(unboundedPreceding, currentRow)` — which Spark
  * executes as a parallel window aggregation (one shuffle on the partition
  * keys, pipelined within partitions). This is the scalable form of
  * `collect_scan`/`Expr.plumba.scan` for associative kernels
  * (reference examples: running max at examples_scan.py:9–25).
  *
  * Null semantics are made to match the reference scan exactly
  * (SURVEY §1.4): a row where any scanned column is null emits null AND
  * does not advance the state. Spark window aggregates already ignore null
  * inputs (state untouched); the `when` mask restores the null emission.
  */
object WindowOps {

  def running(spec: WindowSpec): WindowSpec =
    spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Generic associative running aggregate with reference null semantics.
    * `nullWhen` should be the OR of `isNull` over all scanned columns. */
  def runningAgg(agg: Column, spec: WindowSpec, nullWhen: Column): Column =
    when(nullWhen, lit(null)).otherwise(agg.over(running(spec)))

  def cumMax(c: Column, spec: WindowSpec): Column = runningAgg(max(c), spec, c.isNull)
  def cumMin(c: Column, spec: WindowSpec): Column = runningAgg(min(c), spec, c.isNull)
  def cumSum(c: Column, spec: WindowSpec): Column = runningAgg(sum(c), spec, c.isNull)
  def cumCount(c: Column, spec: WindowSpec): Column =
    when(c.isNull, lit(null)).otherwise(count(c).over(running(spec)))
}
