package graft.plumba

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.plumba.Kernel._
import graft.plumba.syntax._

/** Spark-level golden tests: the plumba ops on DataFrames, pinned to the
  * reference's asserted values (FIXTURES.md §A) plus differential tests
  * (generic kernel path == associative fast path == SQL). */
class SparkPlumbaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def nullFrame: DataFrame = {
    val schema = StructType(Seq(
      StructField("idx", IntegerType), StructField("a", LongType),
      StructField("b", LongType), StructField("irrelevant", LongType)))
    val rows = Seq(
      Row(1, 1L, 30L, 9000L), Row(2, 2L, null, null),
      Row(3, null, 50L, null), Row(4, 3L, 100L, null))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  private val sumKernelD: Fold[Double] =
    Fold[Double](0.5, (acc, args) => acc + args.map(_.asInstanceOf[Long]).sum)

  test("A2 collectFold drops null rows over selected cols only: 134.5") {
    assert(nullFrame.collectFold(Seq("a", "b"), Seq("idx"), sumKernelD) == 134.5)
  }

  test("A2 collectScan emits null, keeps state: [31.5, null, null, 134.5]") {
    val k = Scan[Double](0.5, (acc, args) => acc + args.map(_.asInstanceOf[Long]).sum)
    val got = nullFrame.collectScan(Seq("a", "b"), Seq("idx"), k, DoubleType)
      .collect().sortBy(_.getInt(0)).map(r => Option(r.get(1)))
    assert(got.toSeq == Seq(Some(31.5), None, None, Some(134.5)))
  }

  test("A3 collectScan with array output: whole rows null") {
    val schema = StructType(Seq(
      StructField("idx", IntegerType), StructField("a", LongType), StructField("b", LongType)))
    val rows = Seq(Row(1, 1L, 3L), Row(2, 2L, 2L), Row(3, null, 5L), Row(4, 6L, null), Row(5, 2L, 1L))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val k = Scan[(Long, Long)](
      (6L, 9L),
      (acc, args) => (acc._1 + args(0).asInstanceOf[Long], acc._2 + args(1).asInstanceOf[Long]),
      emit = a => Seq(a._1, a._2))
    val got = df.collectScan(Seq("a", "b"), Seq("idx"), k, ArrayType(LongType))
      .collect().sortBy(_.getInt(0)).map(r => Option(r.get(1)))
    assert(got(0).get.asInstanceOf[scala.collection.Seq[Long]].toSeq == Seq(7L, 12L))
    assert(got(2).isEmpty && got(3).isEmpty)
    assert(got(4).get.asInstanceOf[scala.collection.Seq[Long]].toSeq == Seq(11L, 15L))
  }

  test("mergeable collectFold (partition partials) == sequential == SQL sum") {
    val li = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
    val mergeable = Fold[Double](
      0.0, (acc, args) => acc + args(0).asInstanceOf[Double],
      merge = Some(Merge(0.0, (a: Double, b: Double) => a + b)))
    val got = li.collectFold(Seq("l_quantity"), Seq("l_orderkey", "l_linenumber"), mergeable)
    val seqGot = li.collectFold(Seq("l_quantity"), Seq("l_orderkey", "l_linenumber"),
      mergeable.copy(merge = None))
    val want = li.agg(sum("l_quantity")).head.getDouble(0)
    assert(math.abs(got - want) < 1e-6 && math.abs(seqGot - want) < 1e-6)
  }

  test("commutative collectFold (sort-free path) == ordered mergeable == sequential") {
    val li = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
    // integral quantities: double addition is exact, so all three paths
    // must agree bit-for-bit despite arbitrary partition/row order
    val base = Fold[Double](
      7.0, (acc, args) => acc + args(0).asInstanceOf[Double],
      merge = Some(Merge(0.0, (a: Double, b: Double) => a + b, commutative = true)))
    val unsorted = li.collectFold(Seq("l_quantity"), Seq("l_orderkey", "l_linenumber"), base)
    val ordered = li.collectFold(Seq("l_quantity"), Seq("l_orderkey", "l_linenumber"),
      base.copy(merge = Some(Merge(0.0, (a: Double, b: Double) => a + b))))
    val sequential = li.collectFold(Seq("l_quantity"), Seq("l_orderkey", "l_linenumber"),
      base.copy(merge = None))
    assert(unsorted == ordered && unsorted == sequential)
    // null policy is preserved on the sort-free path
    assert(nullFrame.collectFold(Seq("a", "b"), Seq("idx"),
      sumKernelD.copy(merge = Some(Merge(0.0, (a: Double, b: Double) => a + b, commutative = true)))) == 134.5)
  }

  test("A5 streak via mergeable fold on parquet == islands-SQL") {
    val li = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
    val got = Streak.best(li.collectFold(
      Seq("l_discount"), Seq("l_orderkey", "l_linenumber"), Streak.kernel[Double](_ > 0.05)))
    li.createOrReplaceTempView("li_streak")
    val want = spark.sql(
      """WITH t AS (SELECT l_discount > 0.05 AS c,
        |  row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn FROM li_streak),
        |g AS (SELECT c, rn - row_number() OVER (PARTITION BY c ORDER BY rn) AS grp FROM t)
        |SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM g WHERE c GROUP BY grp)
        |""".stripMargin).head.getLong(0)
    assert(got == want)
  }

  private def userFrame: DataFrame = {
    import spark.implicits._
    Seq(
      (1, "bob", 17.0), (2, "alice", 50.0), (3, "alice", 900.0), (4, "alice", 70.0),
      (5, "alice", -400.0), (6, "alice", 60.0), (7, "bob", 0.5)
    ).toDF("idx", "user", "attempted_purchase")
  }

  private val balanceStep: (Double, IndexedSeq[Any]) => Double = (acc, args) => {
    val x = args(0).asInstanceOf[Double]
    if (acc + x <= 1000.0) acc + x else acc
  }

  test("A7 groupFold per-user balance: alice 610, bob 17.5") {
    val got = userFrame
      .groupFold(Seq("user"), Seq("attempted_purchase"), Seq("idx"),
        Fold[Double](0.0, balanceStep), DoubleType)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("alice" -> 610.0, "bob" -> 17.5))
  }

  test("A7 groupScan per-user balance trajectories") {
    val got = userFrame
      .groupScan(Seq("user"), Seq("attempted_purchase"), Seq("idx"),
        Scan[Double](0.0, balanceStep), DoubleType)
      .collect().groupBy(_.getString(0))
      .map { case (u, rs) => u -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq }
    assert(got("alice") == Seq(50.0, 950.0, 950.0, 550.0, 610.0))
    assert(got("bob") == Seq(17.0, 17.5))
  }

  test("A7 ExprOps.foldCol under groupBy().agg (SQL-expressible balance kernel)") {
    val fold = ExprOps.foldCol(
      Seq(col("idx")), Seq(col("attempted_purchase")),
      lit(0.0).cast("double"),
      (acc, x) => {
        val p = x.getField(ExprOps.v(0))
        when(acc + p <= 1000.0, acc + p).otherwise(acc)
      })
    val got = userFrame.groupBy("user").agg(fold.as("balance"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("alice" -> 610.0, "bob" -> 17.5))
  }

  test("A7 ExprOps.scanListCol: per-group running-balance lists") {
    val scan = ExprOps.scanListCol(
      Seq(col("idx")), Seq(col("attempted_purchase")),
      lit(0.0).cast("double"),
      (acc, x) => {
        val p = x.getField(ExprOps.v(0))
        when(acc + p <= 1000.0, acc + p).otherwise(acc)
      })
    val got = userFrame.groupBy("user").agg(scan.as("traj"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("alice") == Seq(50.0, 950.0, 950.0, 550.0, 610.0))
    assert(got("bob") == Seq(17.0, 17.5))
  }

  test("A8 ExprOps.foldCol multi-in with struct accumulator (purchase caps)") {
    import spark.implicits._
    val df = Seq(
      (1, 5.0, 20.0), (2, 400.0, 2.0), (3, 70.0, 2.0), (4, 4.0, 10.0), (5, 60.0, 1.0)
    ).toDF("idx", "price", "units")
    val init = struct(lit(0.0).as("bal"), lit(0.0).as("un"))
    val fold = ExprOps.foldCol(
      Seq(col("idx")), Seq(col("price"), col("units")), init,
      (acc, x) => {
        val p = x.getField(ExprOps.v(0))
        val u = x.getField(ExprOps.v(1))
        val bal = acc.getField("bal")
        val un = acc.getField("un")
        val ok = (bal + p * u <= 1000.0) && (un + u <= 25.0)
        struct(
          when(ok, bal + p * u).otherwise(bal).as("bal"),
          when(ok, un + u).otherwise(un).as("un"))
      })
    val r = df.agg(fold.as("f")).select("f.bal", "f.un").head
    assert(r.getDouble(0) == 960.0 && r.getDouble(1) == 23.0) // FIXTURES A8 golden
  }

  test("differential: generic collectScan(max) == WindowOps.cumMax on orders") {
    val o = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
    val generic = o.collectScan(
      Seq("o_totalprice"), Seq("o_orderdate", "o_orderkey"),
      Scan.of1[Double, Double](0.0)(math.max), DoubleType, "hi")
      .orderBy("o_orderdate", "o_orderkey").select("hi").collect().map(_.getDouble(0))
    val fast = o.withColumn("hi",
        WindowOps.cumMax(col("o_totalprice"), Window.orderBy(col("o_orderdate"), col("o_orderkey"))))
      .orderBy("o_orderdate", "o_orderkey").select("hi").collect().map(_.getDouble(0))
    assert(generic.sameElements(fast))
  }

  test("WindowOps null semantics: null emits null and does not advance state") {
    val schema = StructType(Seq(StructField("idx", IntegerType), StructField("x", LongType)))
    val rows = Seq(Row(1, 5L), Row(2, null), Row(3, 3L))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val got = df.withColumn("s", WindowOps.cumSum(col("x"), Window.orderBy("idx")))
      .orderBy("idx").collect().map(r => Option(r.get(2)))
    assert(got.toSeq == Seq(Some(5L), None, Some(8L)))
  }
}
