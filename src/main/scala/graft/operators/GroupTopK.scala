package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col

/** Exact per-group TOP-K with MAP-SIDE PRUNING — the scalable form of
  * `row_number() OVER (PARTITION BY g ORDER BY ...) <= k`: the window
  * formulation shuffles EVERY row to its group's task before ranking,
  * while here each input partition first keeps at most k rows per group
  * in a bounded heap, so the shuffle carries O(k · groups · partitions)
  * rows instead of the whole table — at 100 TB that is the difference
  * between shuffling terabytes and shuffling megabytes for a
  * top-3-per-customer report. A second bounded streaming pass per group
  * (secondary sort, same pattern as [[graft.plumba.GroupOps]]) finishes
  * exactly.
  *
  * Results are EXACT and deterministic when the ordering is total —
  * supply tie-break columns (e.g. the primary key) in `sortCols`,
  * exactly as the SQL formulation needs for a stable `row_number`.
  *
  * `sortCols` maps column name → ascending? Sort-key values must be
  * non-null `Comparable`s (numeric/string/date/timestamp — the usual
  * ranking keys); group-key columns are unrestricted.
  */
object GroupTopK {

  def topK(
      df: DataFrame,
      keyCols: Seq[String],
      sortCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(keyCols.nonEmpty, "at least one group key is required")
    require(sortCols.nonEmpty, "at least one ordering column is required")
    require(k > 0, "k must be positive")
    val allCols = df.columns.toSeq
    val keyIdx = keyCols.map(allCols.indexOf)
    val sortIdx = sortCols.map { case (c, asc) => (allCols.indexOf(c), asc) }
    require(keyIdx.forall(_ >= 0) && sortIdx.forall(_._1 >= 0), "unknown column")

    // best-first total order over the sort key tuple
    val rowOrd: Ordering[Row] = new Ordering[Row] {
      def compare(a: Row, b: Row): Int = {
        var i = 0
        while (i < sortIdx.length) {
          val (idx, asc) = sortIdx(i)
          val av = a.get(idx).asInstanceOf[Comparable[Any]]
          val bv = b.get(idx)
          require(av != null && bv != null, "top-k sort keys must be non-null")
          val c = av.compareTo(bv)
          if (c != 0) return if (asc) c else -c
          i += 1
        }
        0
      }
    }
    val enc = Encoders.row(df.schema)

    // pass 1: per input partition, keep at most k best rows per group
    // in a worst-on-top heap (memory O(groups-in-partition × k))
    val pruned = df.mapPartitions { it =>
      val heaps = new java.util.HashMap[Seq[Any], scala.collection.mutable.PriorityQueue[Row]]()
      it.foreach { r =>
        // enforce the contract on every row, not only on rows that
        // happen to be compared — a null key would otherwise be ranked
        // by Spark's null ordering on some paths and error on others
        var si = 0
        while (si < sortIdx.length) {
          require(r.get(sortIdx(si)._1) != null, "top-k sort keys must be non-null")
          si += 1
        }
        val key = keyIdx.map(r.get)
        var h = heaps.get(key)
        if (h == null) {
          h = scala.collection.mutable.PriorityQueue.empty[Row](rowOrd) // max-heap: worst on top
          heaps.put(key, h)
        }
        if (h.size < k) h.enqueue(r)
        else if (rowOrd.compare(r, h.head) < 0) { h.dequeue(); h.enqueue(r) }
      }
      scala.collection.JavaConverters.asScalaIterator(heaps.values().iterator())
        .flatMap(_.iterator)
    }(enc)

    // pass 2: one bounded shuffle of the survivors, secondary sort,
    // streaming emit of the first k rows per group
    val sortExprs = keyCols.map(col) ++ sortCols.map { case (c, asc) =>
      if (asc) col(c).asc else col(c).desc
    }
    pruned
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions(sortExprs: _*)
      .mapPartitions { it =>
        var curKey: Seq[Any] = null
        var emitted = 0
        it.flatMap { r =>
          val key = keyIdx.map(r.get)
          if (curKey == null || key != curKey) { curKey = key; emitted = 0 }
          if (emitted < k) { emitted += 1; Iterator.single(r) }
          else Iterator.empty
        }
      }(enc)
  }
}
