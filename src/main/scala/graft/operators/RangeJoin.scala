package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed POINT-IN-INTERVAL (range) join — `left.point ∈
  * [right.lo, right.hi]` — without a nested-loop plan. Spark's native
  * answer to a non-equi range predicate is BroadcastNestedLoopJoin
  * (fine only when one side is tiny) or a cartesian product; this
  * operator turns the range predicate into an EQUI-join the engine can
  * hash-partition, with the classic interval-bucketing scheme:
  *
  *  - every right interval explodes into the buckets of width `w` it
  *    covers: floor(lo/w) .. floor(hi/w) — expansion factor is
  *    (interval length / w) + 1, the tuning dial;
  *  - every left point maps to its single bucket floor(point/w);
  *  - equi-join on the bucket id, then the exact BETWEEN filter.
  *
  * A matching pair shares EXACTLY ONE bucket (the point's), so the join
  * produces no duplicates — no dedup pass needed. At 100 TB this is one
  * hash shuffle on the bucket id for each side; pick `w` near the median
  * interval length so the explode factor stays small while buckets stay
  * selective (a too-small `w` inflates the right side, a too-large one
  * degenerates toward all-pairs within a bucket — both correct, only
  * balance shifts).
  */
object RangeJoin {

  /** Inner point-in-interval join. Output: all left columns then all
    * right columns (names must not collide — rename beforehand). */
  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c.cast("double") / bucketWidth).cast("long")
    val l = left.withColumn("__rb", bucketOf(col(pointCol)))
    val r = right.withColumn("__rb",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    l.join(r, Seq("__rb"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__rb")
  }
}
