package graft.plumba

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression-level fold/scan — the Spark-native counterpart of the
  * reference's `Expr.plumba.fold` / `Expr.plumba.scan` namespace
  * (reference: src/polars_numba/__init__.py:358–405, :743–799, :802–827):
  * a `Column` usable anywhere a column is, including per-group under
  * `groupBy().agg(...)`.
  *
  * For SQL-expressible kernels the fold compiles to Spark's `aggregate`
  * higher-order function over `array_sort(collect_list(struct(ord, vals)))`
  * — it stays entirely inside Catalyst/whole-stage codegen, with no
  * callback boundary (the reference pays a Rust→Python hop per group,
  * SURVEY §3.3; we pay nothing). Caveat: the group's rows are buffered in
  * the aggregation state, so this path is for bounded-size groups; the
  * streaming-pass alternative for huge groups is [[GroupOps]].
  */
object ExprOps {

  /** Field names inside the packed struct handed to `step`: ordering
    * fields first (so `array_sort`'s lexicographic struct order sorts by
    * them), then value fields `v0..vN`. */
  def v(i: Int): String = s"v$i"

  private def packed(ord: Seq[Column], values: Seq[Column]): (Column, Column) = {
    val fields =
      ord.zipWithIndex.map { case (c, i) => c.as(s"o$i") } ++
        values.zipWithIndex.map { case (c, i) => c.as(v(i)) }
    val notNull = values.map(_.isNotNull).reduce(_ && _)
    (struct(fields: _*), notNull)
  }

  /** Ordered fold as a `Column` (aggregation-shaped, one value per group).
    *
    * Fold null policy (drop null rows over the selected value columns,
    * reference :391) is applied via `collect_list`'s null-skipping.
    * `step(acc, row)` reads value columns with `row.getField(ExprOps.v(i))`.
    */
  def foldCol(
      ord: Seq[Column],
      values: Seq[Column],
      init: Column,
      step: (Column, Column) => Column,
      finish: Column => Column = identity): Column = {
    require(values.nonEmpty, "at least one folded column is required")
    val (pack, notNull) = packed(ord, values)
    val rows = array_sort(collect_list(when(notNull, pack)))
    aggregate(rows, init, step, finish)
  }

  /** Ordered scan as a `Column`: returns the per-group *list* of running
    * accumulator values — the reference's scan-under-agg shape, which
    * yields a list column per group (examples_scan.py:79–82).
    *
    * Scan null policy: a null row contributes a null list element and does
    * not advance the accumulator (reference :718–736). `emit` converts the
    * accumulator column to the output element (e.g. identity, or
    * `a => array(...)` for multi-output).
    *
    * O(n) per group: the prefix states come from the custom `array_scan`
    * higher-order function ([[graft.functions.ArrayScanExpr]]) — the
    * earlier `aggregate`+`concat` formulation re-copied the output list
    * on every step (O(n²) per group). Groups are still buffered in the
    * aggregation state; use [[GroupOps.groupScan]] for one row per input
    * row at scale.
    *
    * MEMORY BOUND: the whole group lives in one aggregation-state row,
    * so at 100 TB a pathological group (a bot user, a default key) is a
    * single-task OOM. `maxGroupSize` (default 1,000,000 rows) makes
    * that failure LOUD and early: an oversize group raises an error
    * naming its size and first row instead of letting one task die an
    * opaque executor death — the fix is always to route that workload
    * to [[GroupOps.groupScan]] (one row per input, streaming pass,
    * no group ever buffered). */
  def scanListCol(
      ord: Seq[Column],
      values: Seq[Column],
      init: Column,
      step: (Column, Column) => Column,
      emit: Column => Column = identity,
      elemType: String = "double",
      maxGroupSize: Int = 1000000): Column = {
    require(values.nonEmpty, "at least one scanned column is required")
    require(maxGroupSize > 0, "maxGroupSize must be positive")
    val fields =
      ord.zipWithIndex.map { case (c, i) => c.as(s"o$i") } ++
        values.zipWithIndex.map { case (c, i) => c.as(v(i)) } :+
        values.map(_.isNull).reduce(_ || _).as("isnull")
    val rows0 = array_sort(collect_list(struct(fields: _*)))
    val rows = when(size(rows0) <= maxGroupSize, rows0).otherwise(
      raise_error(concat(
        lit("plumba scanListCol: group size "), size(rows0).cast("string"),
        lit(s" exceeds maxGroupSize=$maxGroupSize (first row: "),
        to_json(element_at(rows0, 1)),
        lit("); route this workload to GroupOps.groupScan — streaming pass, no group buffered"))))
    // acc struct: (state, elem). Null rows emit a null element, keep state.
    val zero = struct(init.as("state"), lit(null).cast(elemType).as("elem"))
    val states = org.apache.spark.sql.graft.ArrayScanExpr.scan(
      rows,
      zero,
      (acc, x) => {
        val isnull = x.getField("isnull")
        val newState = when(isnull, acc.getField("state")).otherwise(step(acc.getField("state"), x))
        val elem = when(isnull, lit(null).cast(elemType)).otherwise(emit(newState).cast(elemType))
        struct(newState.as("state"), elem.as("elem"))
      })
    transform(states, a => a.getField("elem"))
  }
}
