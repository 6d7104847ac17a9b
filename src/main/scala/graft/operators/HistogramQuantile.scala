package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT quantile boundaries for integral columns via a VALUE HISTOGRAM
  * — no global sort, no interpolation, no sketch. The boundary for
  * quantile `q` is the smallest value whose running count reaches
  * `ceil(q · n)` (the classic discrete/`PERCENTILE_DISC` definition) —
  * a pure integer computation any engine reproduces bit-for-bit, unlike
  * interpolated percentiles whose float arithmetic varies by
  * implementation.
  *
  * Scale shape: ONE partial-aggregated shuffle of `(group, value)`
  * counts — the histogram — whose size is bounded by
  * `groups × distinct-values`, independent of table row count. The
  * window cumsum then runs over the tiny histogram, not the table: for
  * a 50-distinct-value column this is a 50-row frame per group where a
  * sort-based exact quantile would shuffle all 100 TB. The right tool
  * whenever the value domain is small (quantities, scores, lengths,
  * token counts); for unbounded domains use a sketch
  * (`approx_percentile`) and audit it (see `approx_quantile_audit`).
  */
object HistogramQuantile {

  /** Per-group exact quantile boundaries. Returns one row per group:
    * `groupCols ++ [n_rows] ++ one long column per (name, q)`.
    * `groupCols = Nil` computes global quantiles (one output row; the
    * cumsum then runs single-partition over the histogram alone —
    * bounded by the value domain, never the table). Null values are
    * excluded (SQL quantile semantics). */
  def boundaries(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty, "at least one quantile is required")
    require(qs.forall { case (_, q) => q > 0.0 && q <= 1.0 }, "quantiles must be in (0, 1]")
    val gcols = groupCols.map(col)
    val v = col(valueCol).cast("long")
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy((gcols :+ v.as("__v")): _*).agg(count(lit(1)).as("__c"))
    val w = if (groupCols.isEmpty) Window.orderBy("__v")
            else Window.partitionBy(groupCols.map(col): _*).orderBy("__v")
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("__c")).over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val aggs = qs.map { case (name, q) =>
      // smallest value whose running count reaches q*n — since cum is an
      // integer, `cum >= q*n` IS `cum >= ceil(q*n)`. Evaluated in exact
      // integer space as `cum * 1e6 >= n * round(q*1e6)`, so q must be a
      // multiple of 1e-6 (round, not ceil: 0.05*1e6 lands a hair ABOVE
      // 50000 in float and ceil would shift the threshold off by one).
      min(when(col("__cum") * lit(1000000L) >= col("__n") * lit(math.round(q * 1e6)), col("__v")))
        .as(name)
    } :+ max(col("__n")).as("n_rows")
    if (groupCols.isEmpty) cum.agg(aggs.head, aggs.tail: _*)
    else cum.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
  }
}
