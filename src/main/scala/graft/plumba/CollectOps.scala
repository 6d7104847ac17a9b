package graft.plumba

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Whole-frame ordered fold/scan over a `DataFrame` — the Spark-native
  * counterpart of the reference's `collect_fold`/`collect_scan`
  * (reference: src/polars_numba/__init__.py:312–355, :682–740).
  *
  * Polars frames carry an intrinsic row order; Spark datasets do not, so
  * every operator takes explicit ordering columns (SURVEY §7.4 — a
  * deliberate, documented API deviation).
  *
  * Scale design (SURVEY §3.1–3.2):
  *  - Kernels declaring a [[Kernel.Merge]] run as *partial folds per
  *    partition* on executors, combined in partition order on the driver —
  *    O(#partitions) driver work, fully parallel, no row ever crosses to
  *    the driver. This is the 100 TB path.
  *  - Non-mergeable kernels are inherently sequential (the reference's own
  *    model: acc threads across 50k-row batches, :349). The parity path
  *    streams partitions to the driver one at a time via
  *    `toLocalIterator` — bounded memory, exactly the reference's
  *    single-threaded streaming semantics. Prefer group-parallel
  *    [[GroupOps]] at scale.
  */
object CollectOps {

  /** Project, apply fold null policy (drop rows with nulls in the selected
    * value columns ONLY — nulls in other columns never drop a row,
    * reference tests/test_collect_fold.py:41–56), and globally sort. */
  private def prepared(df: DataFrame, valueCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "at least one folded column is required") // reference :272–273
    df.select((orderCols ++ valueCols).distinct.map(col): _*)
      .na.drop(valueCols)
      .orderBy(orderCols.map(col): _*)
      .select(valueCols.map(col): _*)
  }

  private[plumba] def rowValues(r: Row): IndexedSeq[Any] = {
    val n = r.length
    val a = new Array[Any](n)
    var i = 0
    while (i < n) { a(i) = r.get(i); i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
  }

  /** Ordered whole-frame fold → scalar. Kernels whose merge law is
    * declared COMMUTATIVE skip the global sort (and its range-exchange)
    * entirely — permutation invariance makes row and partition order
    * irrelevant, so the scan's natural partitioning feeds the partial
    * folds directly: one pass, zero shuffles. */
  def collectFold[A](df: DataFrame, valueCols: Seq[String], orderCols: Seq[String], k: Kernel.Fold[A]): A = {
    k.merge match {
      case Some(m) if m.commutative =>
        // Unsorted path: project + fold null policy only. Every partition
        // folds from `neutral`; partials combine in any order onto `init`.
        require(valueCols.nonEmpty, "at least one folded column is required")
        val proj = df.select(valueCols.distinct.map(col): _*)
          .na.drop(valueCols.distinct)
          .select(valueCols.map(col): _*)
        proj.rdd
          // tuple wrapper only for the ClassTag (A itself has none)
          .mapPartitions(it => Iterator((0, Kernel.foldRowsFrom(k, m.neutral, it.map(rowValues)))))
          .collect()
          .foldLeft(k.init)((acc, p) => m.combine(acc, p._2))
      case Some(m) =>
        val proj = prepared(df, valueCols, orderCols)
        // Executor-side partial folds; global sort range-partitions rows so
        // partition index order IS row order. Combine partials in that order.
        val partials = proj.rdd
          .mapPartitionsWithIndex { (idx, it) =>
            val from = if (idx == 0) k.init else m.neutral
            Iterator((idx, Kernel.foldRowsFrom(k, from, it.map(rowValues))))
          }
          .collect()
          .sortBy(_._1)
        if (partials.isEmpty) k.init
        else partials.iterator.map(_._2).reduceLeft(m.combine)
      case None =>
        // Parity path: partitions stream to the driver in sorted order,
        // folded sequentially like the reference, via the plain
        // `toLocalIterator` walk (measured faster than the round-14
        // read-ahead variant — see foldPrefetched, which keeps the
        // overlap path behind a flag for fetch-bound deployments).
        val proj = prepared(df, valueCols, orderCols)
        foldPrefetched(proj, k)
    }
  }

  /** Sequential parity fold with a ONE-PARTITION READ-AHEAD: while the
    * driver folds partition i, partition i+1 is already being
    * computed/fetched by a background job. Memory bound: ≤ 2 partitions
    * resident.
    *
    * Lifecycle discipline (round-14 advice): the prefetch runs on a
    * DEDICATED single thread whose creation happens on the CALLING
    * thread at first submit — so it inherits the caller's SparkContext
    * local properties (job group, scheduler pool) via their
    * inheritable thread-local, and a user's `cancelJobGroup` reaches
    * the in-flight prefetch job too (the shared `ExecutionContext
    * .global` workers are pre-created elsewhere and inherit nothing).
    * If the fold throws or stops early, the `finally` awaits the
    * in-flight future (bounded by one partition fetch — or by the
    * group cancellation it now responds to) and shuts the thread down,
    * so no orphan job outlives the call. */
  private def foldPrefetched[A](df: DataFrame, k: Kernel.Fold[A]): A = {
    // MEASURED VERDICT (round 15, sf0.1, min-of-3 warm, near-clean
    // window): the one-partition read-ahead below runs fold_multi_in_out
    // in 2.83 s where the plain serialized `toLocalIterator` walk takes
    // 1.44 s — the `df.rdd` conversion + per-partition `runJob` Array
    // collection costs more than the fetch/fold overlap buys on this
    // workload (toLocalIterator already pipelines partition fetch
    // internally). The plain walk is therefore the DEFAULT; the
    // read-ahead stays behind -Dgraft.fold.prefetch=on for I/O-bound
    // deployments where a partition fetch genuinely dominates the fold
    // (remote object storage), where the overlap argument applies.
    if (!sys.props.get("graft.fold.prefetch").contains("on")) {
      import scala.collection.JavaConverters._
      return Kernel.foldRows(k, df.toLocalIterator().asScala.map(rowValues))
    }
    val rdd = df.rdd
    val sc = rdd.sparkContext
    val n = rdd.getNumPartitions
    if (n == 0) return Kernel.foldRows(k, Iterator.empty)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val exec = java.util.concurrent.Executors.newSingleThreadExecutor { r =>
      val t = new Thread(r, "graft-fold-prefetch")
      t.setDaemon(true)
      t
    }
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(exec)
    @volatile var inflight: Future[Array[Row]] = null
    try {
      def fetch(i: Int): Future[Array[Row]] =
        Future { sc.runJob(rdd, (it: Iterator[Row]) => it.toArray, Seq(i)).head }
      inflight = fetch(0)
      val parts = new Iterator[Array[Row]] {
        private var i = 0
        def hasNext: Boolean = i < n
        def next(): Array[Row] = {
          val cur = Await.result(inflight, Duration.Inf)
          i += 1
          inflight = if (i < n) fetch(i) else null
          cur
        }
      }
      Kernel.foldRows(k, parts.flatMap(a => a.iterator).map(rowValues))
    } finally {
      val last = inflight
      if (last != null) scala.util.Try(Await.ready(last, Duration.Inf))
      exec.shutdown()
    }
  }

  /** Ordered whole-frame scan → DataFrame of (orderCols..., resultName).
    *
    * Kernels declaring a [[Kernel.Merge]] law are routed to the two-pass
    * distributed prefix scan ([[collectScanMergeable]]) — the parallel
    * default for lawful kernels. A generic (possibly non-associative)
    * prefix scan is inherently sequential, so it runs as a single sorted
    * partition — reference parity (the reference is single-threaded too,
    * README.md:57–62). For per-group scans use [[GroupOps.groupScan]]
    * (parallel across groups); for partitioned associative scans
    * [[WindowOps]]. Null rows emit null and do not advance the
    * accumulator. */
  def collectScan[A](
      df: DataFrame,
      valueCols: Seq[String],
      orderCols: Seq[String],
      k: Kernel.Scan[A],
      resultType: DataType,
      resultName: String = "scan"): DataFrame = k.merge match {
    case Some(m) => collectScanMergeable(df, valueCols, orderCols, k, m, resultType, resultName)
    case None => collectScanSequential(df, valueCols, orderCols, k, resultType, resultName)
  }

  private def collectScanSequential[A](
      df: DataFrame,
      valueCols: Seq[String],
      orderCols: Seq[String],
      k: Kernel.Scan[A],
      resultType: DataType,
      resultName: String): DataFrame = {
    require(valueCols.nonEmpty, "at least one scanned column is required")
    val selCols = (orderCols ++ valueCols).distinct
    val sel = df.select(selCols.map(col): _*)
    val ordIdx = orderCols.map(selCols.indexOf)
    val valIdx = valueCols.map(selCols.indexOf)
    val outSchema = StructType(
      orderCols.map(c => sel.schema(selCols.indexOf(c))) :+
        StructField(resultName, resultType, nullable = true))
    val enc = Encoders.row(outSchema)
    sel
      .repartition(1)
      .sortWithinPartitions(orderCols.map(col): _*)
      .mapPartitions { it =>
        var acc = k.init
        it.map { r =>
          val vs = IndexedSeq.tabulate(valIdx.length)(i => r.get(valIdx(i)))
          val out =
            if (Kernel.anyNull(vs)) null
            else { acc = k.step(acc, k.withArgs(vs)); k.emit(acc) }
          Row.fromSeq(ordIdx.map(r.get) :+ out)
        }
      }(enc)
  }

  /** Parallel whole-frame scan for kernels whose step state obeys a
    * [[Kernel.Merge]] law — the classic two-pass distributed prefix scan:
    *
    *  1. globally range-sort, then fold each partition's segment state in
    *     parallel (one pass);
    *  2. prefix-combine the per-partition partials in partition order
    *     (driver-side, O(#partitions));
    *  3. re-scan each partition seeded with its prefix (second pass).
    *
    * Unlike the sequential [[collectScan]] (reference parity) this keeps
    * every executor busy — the 100 TB path for associative global scans
    * that aren't plain window aggregates.
    *
    * The sorted input is materialized ONCE via `localCheckpoint(eager)`
    * so both passes see the identical range partitioning (pass 2's
    * prefix seeds are only valid for pass 1's exact partition layout).
    * Unlike `persist()` — which pins a CacheManager entry until an
    * explicit unpersist and therefore leaked one cached plan per call
    * in long-lived sessions — checkpoint blocks are reference-tracked
    * and dropped by the ContextCleaner when the returned DataFrame is
    * garbage-collected. At cluster scale, reliable checkpointing has
    * the same contract. */
  def collectScanMergeable[A](
      df: DataFrame,
      valueCols: Seq[String],
      orderCols: Seq[String],
      k: Kernel.Scan[A],
      m: Kernel.Merge[A],
      resultType: DataType,
      resultName: String = "scan"): DataFrame = {
    require(valueCols.nonEmpty, "at least one scanned column is required")
    val selCols = (orderCols ++ valueCols).distinct
    val sel = df.select(selCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .localCheckpoint(true)
    val ordIdx = orderCols.map(selCols.indexOf)
    val valIdx = valueCols.map(selCols.indexOf)
    // pass 1: per-partition segment folds (null rows don't advance state)
    val partials = sel.rdd
      .mapPartitionsWithIndex { (idx, it) =>
        var acc = m.neutral
        it.foreach { r =>
          val vs = IndexedSeq.tabulate(valIdx.length)(i => r.get(valIdx(i)))
          if (!Kernel.anyNull(vs)) acc = k.step(acc, k.withArgs(vs))
        }
        Iterator((idx, acc))
      }
      .collect().sortBy(_._1).iterator.map(_._2).toList
    // prefix for partition i = init merged with partials 0..i-1
    val prefixes = partials.scanLeft(k.init)((l, r) => m.combine(l, r)).toIndexedSeq
    val prefixesB = sel.sparkSession.sparkContext.broadcast(prefixes)
    val outSchema = StructType(
      orderCols.map(c => sel.schema(selCols.indexOf(c))) :+
        StructField(resultName, resultType, nullable = true))
    val enc = Encoders.row(outSchema)
    // pass 2: seeded re-scan, same persisted partitioning
    sel.mapPartitions { it =>
      val idx = org.apache.spark.TaskContext.getPartitionId()
      var acc = prefixesB.value(idx)
      it.map { r =>
        val vs = IndexedSeq.tabulate(valIdx.length)(i => r.get(valIdx(i)))
        val out =
          if (Kernel.anyNull(vs)) null
          else { acc = k.step(acc, k.withArgs(vs)); k.emit(acc) }
        Row.fromSeq(ordIdx.map(r.get) :+ out)
      }
    }(enc)
  }

}
