package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed INTERVAL-OVERLAP join — `[l.lo, l.hi] ∩ [r.lo, r.hi] ≠ ∅`
  * (closed intervals, both sides interval-valued) — without a
  * nested-loop plan. The companion to [[RangeJoin]] (point ∈ interval):
  * Spark's native plan for the two-sided overlap predicate is
  * BroadcastNestedLoopJoin or a cartesian product, so this operator
  * turns it into an EQUI-join the engine can hash-partition:
  *
  *  - BOTH sides explode into the fixed-width buckets of width `w`
  *    their interval covers: floor(lo/w) .. floor(hi/w);
  *  - equi-join on (bucket id ++ caller equi-keys), then the exact
  *    overlap filter;
  *  - exactly-once emission WITHOUT a dedup shuffle: an overlapping
  *    pair shares every bucket its intersection touches, so the pair
  *    is kept only in the intersection's FIRST bucket — the "owner"
  *    bucket `floor(max(l.lo, r.lo)/w)`. Every other shared bucket
  *    drops the pair, no distinct pass needed.
  *
  * At 100 TB this is one hash shuffle per side on (bucket, keys); the
  * expansion factor is (interval length / w) + 1 per row — pick `w`
  * near the median interval length (RangeJoin's dial, same trade-off).
  * Dense long-interval workloads degenerate toward all-pairs WITHIN a
  * bucket; that is inherent to the analytic (the output itself is
  * near-quadratic there), not to the plan — aggregate in the caller
  * when the raw pair set is the dense case.
  *
  * Interval endpoints must be integral (long-castable: epoch
  * seconds/ns, day numbers, keys). Negative domains are handled — the
  * bucket id uses exact floor division (`(a - pmod(a, w)) / w`), not
  * truncation toward zero.
  */
object IntervalJoin {

  /** Exact floor division on longs (truncation-free for negatives). */
  private def floorDiv(c: Column, w: Long): Column = {
    val l = c.cast("long")
    // (l - pmod) is an exact multiple of w. The division runs in
    // DECIMAL, not DOUBLE: ns-scale epochs exceed 2^53, where a double
    // quotient can land a hair under the true integer and truncate to
    // the wrong bucket. Decimal division is exact here (integral
    // quotient), and the cast back to long feeds sequence()/the join key.
    ((l - pmod(l, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long")
  }

  /** Inner overlap join. Output: all left columns then all right
    * columns (names must not collide — rename beforehand), one row per
    * overlapping pair. `equiKeys` maps left column → right column for
    * additional equality predicates (co-partitioning keys). */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      loL: String,
      hiL: String,
      loR: String,
      hiR: String,
      bucketWidth: Long,
      equiKeys: Seq[(String, String)] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // The lo-endpoint bucket (`__blo`) is computed ONCE per input row and
    // carried through the explode + join: floor is monotonic, so the
    // owner bucket floor(max(loL, loR)/w) IS max(floor(loL/w),
    // floor(loR/w)) — the post-join exactly-once filter is then a pure
    // long `greatest`, never a per-output-row decimal re-division.
    val l = left
      .withColumn("__lblo", floorDiv(col(loL), bucketWidth))
      .withColumn("__ib", explode(sequence(col("__lblo"), floorDiv(col(hiL), bucketWidth))))
    val r = right
      .withColumn("__rblo", floorDiv(col(loR), bucketWidth))
      .withColumn("__rib", explode(sequence(col("__rblo"), floorDiv(col(hiR), bucketWidth))))
    val cond = equiKeys.foldLeft(l("__ib") === r("__rib")) {
      case (c, (lk, rk)) => c && l(lk) === r(rk)
    }
    l.join(r, cond)
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL))
      // owner bucket: the intersection's first bucket claims the pair
      .filter(col("__ib") === greatest(col("__lblo"), col("__rblo")))
      .drop("__ib", "__rib", "__lblo", "__rblo")
  }
}
