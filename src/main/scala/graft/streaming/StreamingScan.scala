package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.plumba.Kernel

/** Structured-Streaming counterpart of [[graft.plumba.GroupOps.groupScan]]:
  * a per-group running scan whose accumulator lives in `GroupState` and
  * survives across micro-batches — the reference's per-group scan
  * semantics (examples_scan.py:64–82) lifted onto an unbounded stream.
  *
  * Within each micro-batch a group's new rows are sorted by the ordering
  * column before the kernel threads over them; cross-batch order is the
  * stream's arrival order per group (exactly-ordered delivery per key is
  * the precondition, as with any stateful stream fold). Scan null policy
  * is preserved: a null value emits null and leaves the state untouched.
  *
  * Scale: state is one accumulator per key (O(#groups) total, spread
  * across the state store), each micro-batch shuffles only on the group
  * key — the same partitioning story as the batch path.
  */
object StreamingScan {

  /** Per-(long)key running scan of a double value column ordered by a
    * long ordering column. Output: (key, ord, scan) per input row.
    * Concrete types keep the state/row encoders simple; the general
    * pattern is identical for any key/ord/value types. */
  def groupScanStream(
      df: DataFrame,
      keyCol: String,
      ordCol: String,
      valueCol: String,
      k: Kernel.Scan[Double]): Dataset[(Long, Long, Option[Double])] = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("long"), col(ordCol).cast("long"), col(valueCol).cast("double"))
      .as[(Long, Long, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Double, (Long, Long, Option[Double])](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Option[Double])], state: GroupState[Double]) =>
          var acc = state.getOption.getOrElse(k.init)
          val out = rows.toSeq.sortBy(_._2).map {
            case (_, ord, None) => (key, ord, None)
            case (_, ord, Some(v)) =>
              acc = k.step(acc, k.withArgs(IndexedSeq(v)))
              (key, ord, Some(k.emit(acc).asInstanceOf[Double]))
          }
          state.update(acc)
          out.iterator
      }
  }
}
