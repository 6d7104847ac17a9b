package graft.streaming

import org.apache.spark.sql.{Column, Encoder, Encoders, Row, functions}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._

/** Exact per-group top-k as a STREAMING-LEGAL aggregate — the ranking
  * step of a retrieval probe, expressed so Structured Streaming can
  * run it: a `row_number` window cannot execute on an unbounded
  * stream, but an `Aggregator` whose state is the k best (score, id)
  * pairs can — bounded state per group, and sort-and-trim is a proper
  * bounded semilattice (an element outside a partial top-k can never
  * enter the merged top-k, so trimming commutes with merging and the
  * result is partitioning- and arrival-order-independent for distinct
  * (score, id) pairs; ties break by ascending id, the catalog rule).
  *
  * This is also exactly [[graft.operators.GroupTopK]]'s map-side heap
  * in aggregate form — the batch operator prunes then finishes
  * exactly, the streaming form keeps the pruned state AS the state. */
class CosTopKAgg(k: Int)
    extends Aggregator[Row, List[(Double, Long)], Row] {
  require(k > 0, "k must be positive")

  private def trim(s: List[(Double, Long)]): List[(Double, Long)] =
    s.sortBy { case (c, id) => (-c, id) }.take(k)

  override def zero: List[(Double, Long)] = Nil

  override def reduce(b: List[(Double, Long)], r: Row): List[(Double, Long)] =
    if (r.isNullAt(0) || r.isNullAt(1)) b
    else trim((r.getDouble(0), r.getLong(1)) :: b)

  override def merge(a: List[(Double, Long)],
      b: List[(Double, Long)]): List[(Double, Long)] = trim(a ::: b)

  override def finish(b: List[(Double, Long)]): Row = Row(trim(b).map(_._2))

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    Encoders.kryo[List[(Double, Long)]]
  override def outputEncoder: Encoder[Row] =
    Encoders.row(StructType(Seq(StructField("ids",
      ArrayType(LongType, containsNull = false), nullable = false))))
}

object CosTopKAgg {
  /** The aggregate as a callable column: `top-k ids by (score DESC,
    * id ASC)` packed as a struct with an `ids` array (explode with
    * `posexplode(col.getField("ids"))` for ranked rows). */
  def column(k: Int, score: Column, id: Column): Column = {
    val agg = functions.udaf(new CosTopKAgg(k), Encoders.row(StructType(Seq(
      StructField("score", DoubleType, nullable = true),
      StructField("id", LongType, nullable = true)))))
    agg(score, id)
  }
}
