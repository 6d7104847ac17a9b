package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plumba.{ExprOps, Kernel, Streak, WindowOps}
import graft.plumba.syntax._

/** The reference-derived operator queries (SURVEY §2.1/§2.2) on the driver
  * test tables. Each entry pairs a Spark implementation with (where
  * ANSI-SQL-expressible) a DuckDB oracle in [[SparkEntry.oracleSql]].
  *
  * Scale notes per query are inline; the general stance (SURVEY §7.4):
  * associative kernels run as parallel window aggregates or partition-
  * partial folds; non-associative kernels parallelize across groups and
  * stay sequential within a group; whole-frame non-associative ops are
  * sequential by the reference's own semantics.
  */
object ReferenceQueries {
  import Tables.{decSum, sqlDecSum}

  type Q = (SparkSession, String) => DataFrame

  /** Running max of o_totalprice over order date — the reference's first
    * scan example (examples_scan.py:9–25) on parquet. Associative ⇒
    * window fast path (WindowOps), parallel at scale once partitioned;
    * here a global order is demanded, which is one sorted pass. */
  val scanRunningMax: Q = (s, dir) => {
    val o = Tables(s, dir, "orders")
    o.withColumn("hi", WindowOps.cumMax(col("o_totalprice"), Window.orderBy(col("o_orderdate"), col("o_orderkey"))))
      .orderBy("o_orderdate", "o_orderkey")
      .select("o_orderkey", "hi")
  }

  /** Global cumulative sum of event value by time — associative scan via
    * window; decimal-cast for cross-engine exactness. */
  val scanCumsumValue: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val w = Window.orderBy(col("ts"), col("event_id"))
    ev.withColumn("running",
        sum(col("value").cast("decimal(18,6)")).over(WindowOps.running(w)).cast("double"))
      .orderBy("ts", "event_id")
      .select("event_id", "running")
  }

  /** Per-customer running max — the reference's per-group scan shape
    * (examples_scan.py:64–82) in its associative form: window partitioned
    * by group key ⇒ fully parallel across customers at any scale. */
  val groupScanCummaxPerCust: Q = (s, dir) => {
    val o = Tables(s, dir, "orders")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    o.withColumn("hi", WindowOps.cumMax(col("o_totalprice"), w))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      .select("o_custkey", "o_orderkey", "hi")
  }

  /** Longest streak of discounted lineitems in order — the reference's
    * run-length fold (examples_fold.py:11–40) in mergeable segment form:
    * parallel partition partials + ordered combine (the 100 TB path;
    * a (best,cur) kernel would force a sequential pass). */
  val foldLongestStreak: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val streak = Streak.best(
      li.collectFold(Seq("l_discount"), Seq("l_orderkey", "l_linenumber"), Streak.kernel[Double](_ > 0.05)))
    s.range(1).select(lit(streak).cast("bigint").as("streak"))
  }

  /** Fold with extra_args (reference tests/test_collect_fold.py:20–29
    * semantics: extras are added on every row): init 7, extras (0.25, 0.5)
    * over l_quantity. Declared mergeable ⇒ partition-partial path. The
    * closed form 7 + 0.75·n + Σqty is exact in doubles (quantities are
    * integral, extras are quarter-multiples), so the DuckDB oracle matches
    * bit-for-bit. */
  val foldSumExtraArgs: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val k = Kernel.Fold[Double](
      7.0,
      (acc, args) => acc + args(0).asInstanceOf[Double] + args(1).asInstanceOf[Double] + args(2).asInstanceOf[Double],
      extras = Vector(0.25, 0.5),
      merge = Some(Kernel.Merge(0.0, (a: Double, b: Double) => a + b)))
    val total = li.collectFold(Seq("l_quantity"), Seq("l_orderkey", "l_linenumber"), k)
    s.range(1).select(lit(total).cast("double").as("fold_sum"))
  }

  /** Non-associative credit-card balance kernel (examples_fold.py:47–75)
    * per user: parallel across the unbounded user dimension, sequential
    * within each user's event stream (GroupOps secondary sort). The
    * DuckDB oracle replays the same fold with list_reduce over an
    * ordered list — same op sequence ⇒ identical doubles. */
  val groupFoldBalancePerUser: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val k = Kernel.Fold[Double](0.0, (acc, args) => {
      val x = args(0).asInstanceOf[Double]
      if (acc + x <= 1000.0) acc + x else acc
    })
    ev.groupFold(Seq("user_id"), Seq("value"), Seq("ts", "event_id"), k, DoubleType, "balance")
      .orderBy("user_id")
  }

  /** The same per-user balance fold expressed at the Column level
    * (ExprOps.foldCol = aggregate() HOF over a sorted collect_list) —
    * the reference's Expr.plumba.fold composition shape, fully inside
    * Catalyst codegen. Differentially verified against the GroupOps
    * path by sharing one oracle. */
  val exprFoldBalancePerUser: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val fold = ExprOps.foldCol(
      Seq(col("ts"), col("event_id")),
      Seq(col("value")),
      lit(0.0).cast("double"),
      (acc, x) => {
        val p = x.getField(ExprOps.v(0))
        when(acc + p <= lit(1000.0), acc + p).otherwise(acc)
      })
    ev.groupBy("user_id").agg(fold.as("balance")).orderBy("user_id")
  }

  /** Whole-frame non-associative balance scan — reference parity path
    * (single ordered pass, exactly the reference's own sequential
    * execution model). Not SQL-expressible ⇒ rows-only check; pinned by
    * golden tests instead (FIXTURES A6). */
  val scanBalanceLimit: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val k = Kernel.Scan[Double](0.0, (acc, args) => {
      val x = args(0).asInstanceOf[Double]
      if (acc + x <= 1000.0) acc + x else acc
    })
    ev.collectScan(Seq("value"), Seq("ts", "event_id"), k, DoubleType, "balance")
      .orderBy("ts", "event_id")
      .select("event_id", "balance")
  }

  /** Per-user balance scan (trajectory per event) — non-associative,
    * parallel across users via GroupOps. Rows-only check. */
  val groupScanBalancePerUser: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val k = Kernel.Scan[Double](0.0, (acc, args) => {
      val x = args(0).asInstanceOf[Double]
      if (acc + x <= 1000.0) acc + x else acc
    })
    ev.groupScan(Seq("user_id"), Seq("value"), Seq("ts", "event_id"), k, DoubleType, "balance")
      .orderBy("user_id", "ts", "event_id")
      .select("user_id", "event_id", "balance")
  }

  /** Multi-in/multi-out fold (examples_fold.py:101–153 shape): cap total
    * spend and units over (l_extendedprice, l_quantity). Non-associative
    * whole-frame ⇒ sequential parity path; rows-only check (pinned by
    * FIXTURES A8 goldens in tests). */
  val foldMultiInOut: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val k = Kernel.Fold[(Double, Double)](
      (0.0, 0.0),
      (acc, args) => {
        val (maxBal, maxUnits) = (args(0).asInstanceOf[Double], args(1).asInstanceOf[Double])
        val (p, u) = (args(2).asInstanceOf[Double], args(3).asInstanceOf[Double])
        if (acc._1 + p <= maxBal && acc._2 + u <= maxUnits) (acc._1 + p, acc._2 + u) else acc
      },
      extras = Vector(1.0e9, 1.0e6))
    val (bal, units) =
      li.collectFold(Seq("l_extendedprice", "l_quantity"), Seq("l_orderkey", "l_linenumber"), k)
    s.range(1).select(lit(bal).cast("double").as("balance"), lit(units).cast("double").as("units"))
  }

  /** Multi-state scan (the reference's tuple-accumulator cum_sum,
    * tests/test_collect_scan.py:190–208) in associative form: two
    * running sums in one pass, decimal-exact. */
  val scanMultiState: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val w = WindowOps.running(Window.orderBy(col("l_orderkey"), col("l_linenumber")))
    li.withColumn("qty_run", sum(col("l_quantity")).over(w))
      .withColumn("price_run", sum(col("l_extendedprice").cast("decimal(18,6)")).over(w).cast("double"))
      .orderBy("l_orderkey", "l_linenumber")
      .select("l_orderkey", "l_linenumber", "qty_run", "price_run")
  }

  /** Scan under agg returning a list per group — the reference's
    * per-group scan-list shape (examples_scan.py:79–82): per-user
    * trajectory of running sums as an array column, order-restored. */
  val groupScanListCumsum: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val w = WindowOps.running(Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id")))
    val rs = sum(col("value").cast("decimal(18,6)")).over(w).cast("double")
    ev.withColumn("rs", rs)
      .groupBy("user_id")
      .agg(transform(
        sort_array(collect_list(struct(col("ts"), col("event_id"), col("rs")))),
        x => x.getField("rs")).as("traj"))
      .orderBy("user_id")
  }

  /** Per-order product fold (the reference's `multiply` kernel,
    * tests/test_collect_fold.py:96–97) via the Column-level foldCol.
    * Restricted to the first five line numbers so the integer product
    * stays below 2^53 at any scale factor — exact in doubles in any
    * evaluation order, so DuckDB's product() is an exact oracle (an
    * unbounded product overflows exactness: observed 1-ulp divergence
    * at sf0.1 on a 1.6e23 product). */
  val groupFoldProduct: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem").filter(col("l_linenumber") <= 5)
    val fold = ExprOps.foldCol(
      Seq(col("l_linenumber")), Seq(col("l_quantity")),
      lit(1.0).cast("double"),
      (acc, x) => acc * x.getField(ExprOps.v(0)))
    li.groupBy("l_orderkey").agg(fold.as("qty_product")).orderBy("l_orderkey")
  }

  /** The running-max scan again, but through the two-pass PARALLEL
    * prefix scan ([[graft.plumba.CollectOps.collectScanMergeable]]) —
    * same oracle as the window form, proving the distributed path
    * through the correctness gate. */
  val scanRunningMaxParallel: Q = (s, dir) => {
    val o = Tables(s, dir, "orders")
    graft.plumba.CollectOps.collectScanMergeable(
        o, Seq("o_totalprice"), Seq("o_orderdate", "o_orderkey"),
        Kernel.Scan.of1[Double, Double](0.0)(math.max),
        Kernel.Merge(0.0, (a: Double, b: Double) => math.max(a, b)),
        DoubleType, "hi")
      .orderBy("o_orderdate", "o_orderkey")
      .select("o_orderkey", "hi")
  }

  /** Longest big-order streak per customer through the RANGE-SALTED
    * mergeable group fold ([[graft.plumba.GroupOps.groupFoldMergeable]]):
    * a skewed customer's ordered fold spreads over order-date range
    * buckets. Oracle: per-customer islands SQL. */
  val groupFoldStreakPerCust: Q = (s, dir) => {
    val o = Tables(s, dir, "orders")
    graft.plumba.GroupOps.groupFoldMergeable(
        o, Seq("o_custkey"), Seq("o_totalprice"), Seq("o_orderdate", "o_orderkey"),
        Streak.kernel[Double](_ > 300000.0), LongType, "streak",
        buckets = 8, emit = (a: Streak.S) => Streak.best(a))
      .orderBy("o_custkey")
  }

  val defs: Map[String, Q] = Map(
    "scan_running_max_par" -> scanRunningMaxParallel,
    "group_fold_streak_per_cust" -> groupFoldStreakPerCust,
    "group_fold_product" -> groupFoldProduct,
    "scan_multi_state" -> scanMultiState,
    "group_scan_list_cumsum" -> groupScanListCumsum,
    "scan_running_max" -> scanRunningMax,
    "scan_cumsum_value" -> scanCumsumValue,
    "group_scan_cummax_per_cust" -> groupScanCummaxPerCust,
    "fold_longest_streak" -> foldLongestStreak,
    "fold_sum_extra_args" -> foldSumExtraArgs,
    "group_fold_balance_per_user" -> groupFoldBalancePerUser,
    "expr_fold_balance_per_user" -> exprFoldBalancePerUser,
    "scan_balance_limit" -> scanBalanceLimit,
    "group_scan_balance_per_user" -> groupScanBalancePerUser,
    "fold_multi_in_out" -> foldMultiInOut
  )

  /** DuckDB replay of the non-associative per-user fold via a recursive
    * CTE stepping through each user's ordered event list. (A lambda
    * `list_reduce` formulation misaligns rows across groups in DuckDB
    * 1.0.0 under parallel evaluation — observed empirically; the CTE form
    * is exact.) Same op sequence as the kernel ⇒ identical doubles. */
  private val balanceOracle =
    """WITH RECURSIVE seq AS (
      |  SELECT user_id, list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
      |  FROM events GROUP BY user_id),
      |r AS (
      |  SELECT user_id, vals, 1 AS i, CAST(0.0 AS DOUBLE) AS acc FROM seq
      |  UNION ALL
      |  SELECT user_id, vals, i + 1,
      |    CASE WHEN acc + vals[i] <= 1000.0 THEN acc + vals[i] ELSE acc END
      |  FROM r WHERE i <= len(vals))
      |SELECT user_id, acc AS balance FROM r WHERE i = len(vals) + 1 ORDER BY user_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "scan_running_max_par" ->
      """SELECT o_orderkey,
        |  MAX(o_totalprice) OVER (ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
        |FROM orders ORDER BY o_orderdate, o_orderkey""".stripMargin,
    "group_fold_streak_per_cust" ->
      """WITH t AS (SELECT o_custkey, o_totalprice > 300000 AS c,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders),
        |runs AS (SELECT o_custkey, count(*) AS len FROM (
        |    SELECT o_custkey, c, rn - row_number() OVER (PARTITION BY o_custkey, c ORDER BY rn) AS grp FROM t)
        |  WHERE c GROUP BY o_custkey, grp),
        |best AS (SELECT o_custkey, max(len) AS streak FROM runs GROUP BY o_custkey)
        |SELECT k.o_custkey, CAST(COALESCE(b.streak, 0) AS BIGINT) AS streak
        |FROM (SELECT DISTINCT o_custkey FROM orders) k
        |LEFT JOIN best b ON k.o_custkey = b.o_custkey
        |ORDER BY k.o_custkey""".stripMargin,
    "group_fold_product" ->
      """SELECT l_orderkey, product(l_quantity) AS qty_product
        |FROM lineitem WHERE l_linenumber <= 5
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "scan_multi_state" ->
      """SELECT l_orderkey, l_linenumber,
        |  SUM(l_quantity) OVER w AS qty_run,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS price_run
        |FROM lineitem
        |WINDOW w AS (ORDER BY l_orderkey, l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "group_scan_list_cumsum" ->
      """SELECT user_id, list(rs ORDER BY ts, event_id) AS traj FROM (
        |  SELECT user_id, ts, event_id,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS rs
        |  FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "scan_running_max" ->
      """SELECT o_orderkey,
        |  MAX(o_totalprice) OVER (ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
        |FROM orders ORDER BY o_orderdate, o_orderkey""".stripMargin,
    "scan_cumsum_value" ->
      s"""SELECT event_id,
         |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
         |FROM events ORDER BY ts, event_id""".stripMargin,
    "group_scan_cummax_per_cust" ->
      """SELECT o_custkey, o_orderkey,
        |  MAX(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "fold_longest_streak" ->
      """WITH t AS (SELECT l_discount > 0.05 AS c,
        |    row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn FROM lineitem),
        |  g AS (SELECT c, rn - row_number() OVER (PARTITION BY c ORDER BY rn) AS grp FROM t)
        |SELECT CAST(max(cnt) AS BIGINT) AS streak
        |FROM (SELECT count(*) AS cnt FROM g WHERE c GROUP BY grp)""".stripMargin,
    "fold_sum_extra_args" ->
      "SELECT CAST(7 + 0.75 * count(*) + sum(l_quantity) AS DOUBLE) AS fold_sum FROM lineitem",
    "group_fold_balance_per_user" -> balanceOracle,
    "expr_fold_balance_per_user" -> balanceOracle
  )
}
