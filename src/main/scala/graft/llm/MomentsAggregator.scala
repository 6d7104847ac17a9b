package graft.llm

import org.apache.spark.sql.{Column, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions
import org.apache.spark.sql.types._

/** Mutable partial state for [[MomentsAggregator]]: the flattened
  * upper-triangular pair-product sums (row-major, index
  * `i·d − i(i−1)/2 + (j−i)`), the per-dimension first-moment sums, and
  * the contributing row count. Arrays are allocated lazily on the first
  * non-null vector so `zero` carries no width assumption — the
  * aggregator learns d from the data, exactly like the explode form
  * derived it from `size(q)`. */
final class MomentsBuf(
    var pair: Array[Long],
    var dim: Array[Long],
    var n: Long)
  extends Serializable

/** The typed-`Aggregator` form of [[Similarity.secondMoments]]'s
  * d(d+1)/2 moment accumulation.
  *
  * The previous form exploded each vector into its d(d+1)/2
  * `(i, j, xy, xi, xj)` structs and hash-aggregated them — correct and
  * map-side-combined, but the explode itself materializes
  * O(rows · d²/2) struct allocations and hash probes (4.16M for the
  * 2,000×64-d fixture; at d = 1024 it would be 524k structs PER ROW).
  * This aggregator does the identical integer arithmetic as in-place
  * multiply-adds on one flat Long array per partition: the scan stage
  * touches each vector once, the shuffle carries ONE ~8·d²/2-byte
  * buffer per partition (17 KB at d = 64), and the final merge is a
  * d²/2-length vector add per partition — O(partitions · d²) total,
  * same bound as before, without the per-row allocation constant.
  * Null vectors are skipped (matching `explode`'s null-drop), so `n`
  * counts exactly the contributing rows.
  *
  * Sums are plain Long adds of the same quantized products, so the
  * result is bit-identical to the explode form under any partitioning —
  * the DuckDB oracle replay is unchanged. */
class MomentsAggregator extends Aggregator[Row, MomentsBuf, Row] {

  override def zero: MomentsBuf =
    new MomentsBuf(Array.emptyLongArray, Array.emptyLongArray, 0L)

  override def reduce(b: MomentsBuf, in: Row): MomentsBuf = {
    if (in.isNullAt(0)) return b // null vector: contribute nothing
    val q = in.getSeq[Long](0)
    val d = q.length
    // empty vector: contribute nothing — matching the explode form,
    // where a zero-length array emits no (i, j) rows at all. Without
    // this, an empty array seen first would pin the width at 0 (every
    // later row throws) or, seen after allocation, throw the uniform-
    // width require the explode form never raised.
    if (d == 0) return b
    if (b.dim.isEmpty && d > 0) {
      b.pair = new Array[Long](d * (d + 1) / 2)
      b.dim = new Array[Long](d)
    }
    require(d == b.dim.length,
      s"secondMoments requires a uniform-width embedding column (saw $d and ${b.dim.length})")
    val qa = new Array[Long](d)
    var i = 0
    while (i < d) { qa(i) = q(i); i += 1 }
    var idx = 0
    i = 0
    while (i < d) {
      val qi = qa(i)
      b.dim(i) += qi
      var j = i
      while (j < d) { b.pair(idx) += qi * qa(j); idx += 1; j += 1 }
      i += 1
    }
    b.n += 1
    b
  }

  override def merge(a: MomentsBuf, b: MomentsBuf): MomentsBuf = {
    if (a.dim.isEmpty) return b
    if (b.dim.isEmpty) return a
    require(a.dim.length == b.dim.length,
      s"secondMoments requires a uniform-width embedding column " +
        s"(saw ${a.dim.length} and ${b.dim.length})")
    var i = 0
    while (i < a.pair.length) { a.pair(i) += b.pair(i); i += 1 }
    i = 0
    while (i < a.dim.length) { a.dim(i) += b.dim(i); i += 1 }
    a.n += b.n
    a
  }

  override def finish(b: MomentsBuf): Row = {
    val d = b.dim.length
    val out = new Array[Any](d * (d + 1) / 2)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(idx) = Row(i, j, b.pair(idx), b.dim(i), b.dim(j), b.n)
        idx += 1
        j += 1
      }
      i += 1
    }
    Row(out.toSeq)
  }

  override def bufferEncoder: Encoder[MomentsBuf] = Encoders.kryo[MomentsBuf]
  override def outputEncoder: Encoder[Row] =
    Encoders.row(StructType(Seq(StructField("rows",
      ArrayType(MomentsAggregator.rowSchema, containsNull = false), nullable = false))))
}

object MomentsAggregator {
  private[llm] val rowSchema: StructType = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("sum_xy", LongType, nullable = false),
    StructField("sum_x_i", LongType, nullable = false),
    StructField("sum_x_j", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))

  /** The aggregate as a callable column over one `array<long>` argument. */
  def column(q: Column): Column = {
    val agg = functions.udaf(new MomentsAggregator, Encoders.row(StructType(Seq(
      StructField("q", ArrayType(LongType, containsNull = true), nullable = true)))))
    agg(q)
  }
}
