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
  /** Loud cardinality cap (the hot-bucket-cap convention): the whole
    * design rests on the histogram being value-domain-sized, and on a
    * high-cardinality near-continuous column it would silently degrade
    * into the global sort it exists to avoid — the single-partition
    * global cumsum worst of all. The cap turns that contract from
    * documented into ENFORCED: any group's histogram exceeding it
    * fails the job with a pointer to the sketch path. */
  val MaxDistinctValues: Int = 1 << 20

  def boundaries(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qs: Seq[(String, Double)],
      maxDistinct: Int = MaxDistinctValues): DataFrame = {
    require(qs.nonEmpty, "at least one quantile is required")
    require(qs.forall { case (_, q) => q > 0.0 && q <= 1.0 }, "quantiles must be in (0, 1]")
    // the threshold compare runs in exact integer space scaled by 1e6, so
    // q must itself be a multiple of 1e-6 — reject e.g. 1.0/3 loudly
    // instead of silently shifting the boundary by one value
    require(qs.forall { case (_, q) => math.round(q * 1e6) / 1e6 == q },
      s"quantiles must be multiples of 1e-6 (got ${qs.map(_._2).mkString(", ")})")
    val gcols = groupCols.map(col)
    // Spark's long cast TRUNCATES fractional values while SQL engines'
    // CAST rounds — a silent cross-engine divergence. The operator is
    // defined on integral columns only, so fail loudly on anything else.
    val raw = col(valueCol)
    val v = {
      val t = raw.cast("long")
      when(t.cast("double") === raw.cast("double"), t).otherwise(raise_error(concat(
        lit(s"HistogramQuantile: non-integral value in column '$valueCol': "),
        raw.cast("string"))))
    }
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy((gcols :+ v.as("__v")): _*).agg(count(lit(1)).as("__c"))
    val w = if (groupCols.isEmpty) Window.orderBy("__v")
            else Window.partitionBy(groupCols.map(col): _*).orderBy("__v")
    // the cap guard rides the same window pass as the cumsum (a
    // row_number over rows already being counted — no extra job) and is
    // folded INTO the consumed __cum column so column pruning can never
    // optimize the check away
    val rn = row_number().over(w)
    val rawCum = sum(col("__c")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val cum = hist
      .withColumn("__cum", when(rn > lit(maxDistinct), raise_error(lit(
          s"HistogramQuantile: histogram for column '$valueCol' exceeds $maxDistinct distinct " +
            "values — this operator is for small value domains; use approx_percentile " +
            "(+ approx_quantile_audit) for near-continuous columns")))
        .otherwise(rawCum))
      .withColumn("__n", sum(col("__c")).over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val aggs = qs.map { case (name, q) =>
      // smallest value whose running count reaches q*n — since cum is an
      // integer, `cum >= q*n` IS `cum >= ceil(q*n)`. Evaluated in exact
      // integer space as `cum * 1e6 >= n * round(q*1e6)` (round, not
      // ceil: 0.05*1e6 lands a hair ABOVE 50000 in float and ceil would
      // shift the threshold off by one). Both sides multiply in DECIMAL
      // so groups beyond ~9.2e12 rows (Long.MaxValue / 1e6) cannot
      // overflow the long product at 100 TB scale.
      min(when(
          col("__cum").cast("decimal(20,0)") * lit(1000000L) >=
            col("__n").cast("decimal(20,0)") * lit(math.round(q * 1e6)),
          col("__v")))
        .as(name)
    } :+ max(col("__n")).as("n_rows")
    if (groupCols.isEmpty) cum.agg(aggs.head, aggs.tail: _*)
    else cum.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
  }
}
