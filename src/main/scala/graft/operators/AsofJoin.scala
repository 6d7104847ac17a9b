package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Distributed LEFT AS-OF JOIN — for every left row, the payload of the
  * LATEST right row with the same keys and time <= left time (or
  * strictly <, with `strict = true`). The classic time-series join Spark
  * has no native operator for (point-in-time feature lookup, "state as
  * of event time").
  *
  * Built on this library's own ordered-scan machinery instead of a join:
  * tag both inputs, UNION them, shuffle ONCE on the keys, secondary-sort
  * by (keys, time, side-flag, tie-breaks) and run one streaming pass
  * that carries the last-seen right payload per key — exactly the
  * [[graft.plumba.GroupOps]] secondary-sort pattern. Cost is one shuffle
  * of |left| + |right| rows and a pipelined sort: no row explosion, no
  * per-key windowing over a joined product, and a group never has to fit
  * in memory. At 100 TB both sides co-partition on the keys; skew on a
  * hot key spreads across that key's time range only at sort time, not
  * as a join blow-up.
  *
  * Determinism contract: when several right rows share (keys, time), the
  * carried payload is the LAST in `rightTieBreak` order (supply
  * tie-break columns, or pre-aggregate the right side to unique
  * (keys, time) — the catalog query does the latter, which is also what
  * makes the DuckDB `ASOF JOIN` oracle exact).
  *
  * Output columns: keyCols, timeCol, the remaining left columns, then
  * one `asof_<payload>` column per requested right payload (null when no
  * right row precedes).
  */
object AsofJoin {

  def asofLast(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      payloadCols: Seq[String],
      rightTieBreak: Seq[String] = Nil,
      strict: Boolean = false,
      outPrefix: String = "asof_"): DataFrame = {
    require(keyCols.nonEmpty, "at least one join key is required")
    require(payloadCols.nonEmpty, "at least one right payload column is required")
    require(rightTieBreak.forall(payloadCols.contains),
      "tie-break columns must be included in payloadCols (they ride the union as payload)")
    val leftRest = left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == timeCol)
    val pName = payloadCols.map(c => s"__p_$c")
    val rSchema = right.schema
    val lSchema = left.schema

    // tagged union: identical layout from both sides —
    // keys, time, leftRest (null on right rows), payloads (null on left
    // rows), flag. Right rows flag 0 sort BEFORE left rows (flag 1) at
    // equal time -> inclusive (<=); strict mode flags right 2 -> after.
    val rightFlag = if (strict) 2 else 0
    val lp = left.select(
      keyCols.map(col) ++ Seq(col(timeCol)) ++ leftRest.map(col) ++
        payloadCols.zip(pName).map { case (c, n) =>
          lit(null).cast(rSchema(c).dataType).as(n)
        } :+ lit(1).as("__flag"): _*)
    val rp = right.select(
      keyCols.map(col) ++ Seq(col(timeCol)) ++ leftRest.map(c =>
        lit(null).cast(lSchema(c).dataType).as(c)) ++
        payloadCols.zip(pName).map { case (c, n) => col(c).as(n) } :+
        lit(rightFlag).as("__flag"): _*)
    val unioned = lp.union(rp)

    val unionCols = unioned.columns.toSeq
    val keyIdx = keyCols.map(unionCols.indexOf)
    val flagIdx = unionCols.indexOf("__flag")
    val payloadIdx = pName.map(unionCols.indexOf)
    val leftOutIdx = (keyCols ++ Seq(timeCol) ++ leftRest).map(unionCols.indexOf)

    val outSchema = StructType(
      (keyCols ++ Seq(timeCol) ++ leftRest).map(c => lSchema(c)) ++
        payloadCols.map(c => StructField(s"$outPrefix$c", rSchema(c).dataType, nullable = true)))
    val nPayload = payloadCols.length

    val sortCols =
      (keyCols :+ timeCol :+ "__flag") ++ rightTieBreak.map(c => s"__p_$c")
    unioned
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .mapPartitions { it =>
        var curKey: Seq[Any] = null
        var last: Array[Any] = null
        it.flatMap { r =>
          val key = keyIdx.map(r.get)
          if (curKey == null || key != curKey) { curKey = key; last = null }
          if (r.getInt(flagIdx) != 1) {
            // right row: remember its payload (last-in-order wins)
            val p = new Array[Any](nPayload)
            var i = 0
            while (i < nPayload) { p(i) = r.get(payloadIdx(i)); i += 1 }
            last = p
            Iterator.empty
          } else {
            val payload: Seq[Any] =
              if (last == null) Seq.fill[Any](nPayload)(null)
              else scala.collection.immutable.ArraySeq.unsafeWrapArray(last)
            Iterator.single(Row.fromSeq(leftOutIdx.map(r.get) ++ payload))
          }
        }
      }(Encoders.row(outSchema))
  }
}
