package graft.plumba

import org.apache.spark.sql.{Column, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** The typed-`Aggregator` route for JVM-lambda ordered folds under
  * `groupBy().agg(...)` (SURVEY §7.3: "custom Aggregator[Row, Buf, Out]").
  *
  * A non-associative fold has no lawful `merge` of partial states, so the
  * aggregator buffers `(ord, values)` pairs and runs the kernel once, in
  * `finish`, over the sorted buffer — `merge` concatenates buffers, which
  * IS lawful (it defers all ordering to the end). This trades memory
  * (O(group)) for a shuffle-safe two-phase aggregation; the streaming-
  * pass alternative with O(1) state per group is [[GroupOps.groupFold]].
  * Use this form when the fold must compose with other aggregates in a
  * single `agg(...)` list.
  */
class SortedFoldAggregator[A](k: Kernel.Fold[A], emit: A => Any = (a: A) => a: Any)
    extends Aggregator[(Seq[Long], Seq[Double]), List[(Seq[Long], Seq[Double])], Double] {

  override def zero: List[(Seq[Long], Seq[Double])] = Nil

  override def reduce(buf: List[(Seq[Long], Seq[Double])], row: (Seq[Long], Seq[Double])): List[(Seq[Long], Seq[Double])] =
    row :: buf

  override def merge(a: List[(Seq[Long], Seq[Double])], b: List[(Seq[Long], Seq[Double])]): List[(Seq[Long], Seq[Double])] =
    a ::: b

  override def finish(buf: List[(Seq[Long], Seq[Double])]): Double = {
    implicit val ordSeq: Ordering[Seq[Long]] = Ordering.Implicits.seqOrdering[Seq, Long]
    val sorted = buf.sortBy(_._1)
    val acc = Kernel.foldRows(k, sorted.iterator.map(_._2.map(v => v: Any).toIndexedSeq))
    emit(acc).asInstanceOf[Double]
  }

  override def bufferEncoder: Encoder[List[(Seq[Long], Seq[Double])]] =
    Encoders.kryo[List[(Seq[Long], Seq[Double])]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object SortedFoldAggregator {
  /** Column usable directly in `df.groupBy(...).agg(...)`: ordering
    * columns and value columns are packed into long/double sequences.
    * (Long-orderable keys + double values cover the reference kernel
    * surface; the fully-generic path is [[GroupOps]].) */
  def foldColumn[A](ordCols: Seq[Column], valueCols: Seq[Column], k: Kernel.Fold[A], emit: A => Any = (a: A) => a: Any): Column = {
    val agg = functions.udaf(new SortedFoldAggregator(k, emit),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Long], Seq[Double])]())
    agg(
      functions.array(ordCols.map(_.cast("long")): _*),
      functions.array(valueCols.map(_.cast("double")): _*))
  }
}
