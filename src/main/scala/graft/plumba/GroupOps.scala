package graft.plumba

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Per-group ordered fold/scan — the Spark-native counterpart of the
  * reference's `group_by("user").agg(expr.plumba.fold/scan(...))`
  * (reference: examples_fold.py:81–97, examples_scan.py:64–82).
  *
  * This is the reference's own scaling story made distributed: parallelism
  * *across* groups (unbounded group count spread over executors),
  * strictly sequential order *within* a group (SURVEY §7.4). Implemented
  * with the secondary-sort pattern — `repartition(keys)` +
  * `sortWithinPartitions(keys, order)` + a single streaming pass with
  * group-change detection — so a group never has to fit in memory and no
  * per-group shuffle or `collect_list` buffer is built. At 100 TB this is
  * one hash shuffle on the group keys followed by pipelined, spill-aware
  * sorting; skewed groups are the only hotspot (inherent: order within a
  * group cannot be split for non-mergeable kernels).
  */
object GroupOps {

  /** Per-group ordered fold → one row per group: (keyCols..., resultName).
    * Fold null policy: rows with nulls in value columns are dropped;
    * groups whose rows are all dropped still emit `init`-folded state. */
  def groupFold[A](
      df: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String],
      orderCols: Seq[String],
      k: Kernel.Fold[A],
      resultType: DataType,
      resultName: String = "fold",
      emit: A => Any = (a: A) => a: Any): DataFrame = {
    require(keyCols.nonEmpty, "at least one group key is required")
    require(valueCols.nonEmpty, "at least one folded column is required")
    val selCols = (keyCols ++ orderCols ++ valueCols).distinct
    val sel = df.select(selCols.map(col): _*)
    val keyIdx = keyCols.map(selCols.indexOf)
    val valIdx = valueCols.map(selCols.indexOf)
    val outSchema = StructType(
      keyCols.map(c => sel.schema(selCols.indexOf(c))) :+
        StructField(resultName, resultType, nullable = true))
    val enc = Encoders.row(outSchema)
    sel
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
      .mapPartitions { it =>
        new Iterator[Row] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Row = {
            val key = keyIdx.map(buf.head.get)
            var acc = k.init
            while (buf.hasNext && keyIdx.map(buf.head.get) == key) {
              val r = buf.next()
              val vs = IndexedSeq.tabulate(valIdx.length)(i => r.get(valIdx(i)))
              if (!Kernel.anyNull(vs)) acc = k.step(acc, k.withArgs(vs))
            }
            Row.fromSeq(key :+ emit(acc))
          }
        }
      }(enc)
  }

  /** Per-group ordered scan → one row per input row:
    * (keyCols..., orderCols..., resultName). Scan null policy: a null row
    * emits null and does not advance that group's accumulator. */
  def groupScan[A](
      df: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String],
      orderCols: Seq[String],
      k: Kernel.Scan[A],
      resultType: DataType,
      resultName: String = "scan"): DataFrame = {
    require(keyCols.nonEmpty, "at least one group key is required")
    require(valueCols.nonEmpty, "at least one scanned column is required")
    val selCols = (keyCols ++ orderCols ++ valueCols).distinct
    val sel = df.select(selCols.map(col): _*)
    val keyIdx = keyCols.map(selCols.indexOf)
    val ordIdx = orderCols.map(selCols.indexOf)
    val valIdx = valueCols.map(selCols.indexOf)
    val outSchema = StructType(
      keyCols.map(c => sel.schema(selCols.indexOf(c))) ++
        orderCols.filterNot(keyCols.contains).map(c => sel.schema(selCols.indexOf(c))) :+
        StructField(resultName, resultType, nullable = true))
    val outOrdIdx = orderCols.filterNot(keyCols.contains).map(selCols.indexOf)
    val enc = Encoders.row(outSchema)
    sel
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
      .mapPartitions { it =>
        var curKey: Seq[Any] = null
        var acc = k.init
        it.map { r =>
          val key = keyIdx.map(r.get)
          if (curKey == null || key != curKey) { curKey = key; acc = k.init }
          val vs = IndexedSeq.tabulate(valIdx.length)(i => r.get(valIdx(i)))
          val out =
            if (Kernel.anyNull(vs)) null
            else { acc = k.step(acc, k.withArgs(vs)); k.emit(acc) }
          Row.fromSeq(key ++ outOrdIdx.map(r.get) :+ out)
        }
      }(enc)
  }
}
