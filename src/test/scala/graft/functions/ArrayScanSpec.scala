package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import org.apache.spark.sql.graft.ArrayScanExpr

/** Edge cases for the custom `array_scan` higher-order function. */
class ArrayScanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("array_scan emits every post-step state in order (Column API)") {
    val got = Seq(Tuple1(Seq(1, 2, 3, 4))).toDF("a")
      .select(ArrayScanExpr.scan($"a", lit(0), (acc, x) => acc + x).as("s"))
      .collect()(0).getSeq[Int](0)
    assert(got == Seq(1, 3, 6, 10))
  }

  test("array_scan on an empty array is an empty array; on null input is null") {
    val df = Seq(Tuple1(Option(Seq.empty[Int])), Tuple1(Option.empty[Seq[Int]])).toDF("a")
      .select(ArrayScanExpr.scan($"a", lit(0), (acc, x) => acc + x).as("s"))
    val rows = df.collect()
    assert(rows(0).getSeq[Int](0) == Seq.empty)
    assert(rows(1).isNullAt(0))
  }

  test("array_scan threads struct accumulators and copies each emitted state") {
    // running (min, max) pairs — a mutable-row accumulator: if eval did
    // not copy per element, every output slot would alias the last state
    val got = Seq(Tuple1(Seq(3, 1, 4, 1, 5))).toDF("a")
      .select(ArrayScanExpr.scan(
        $"a",
        struct(lit(Int.MaxValue).as("lo"), lit(Int.MinValue).as("hi")),
        (acc, x) => struct(
          least(acc.getField("lo"), x).as("lo"),
          greatest(acc.getField("hi"), x).as("hi"))).as("s"))
      .selectExpr("transform(s, p -> p.lo)", "transform(s, p -> p.hi)")
      .collect()(0)
    assert(got.getSeq[Int](0) == Seq(3, 1, 1, 1, 1))
    assert(got.getSeq[Int](1) == Seq(3, 3, 4, 4, 5))
  }

  test("array_scan from SQL with a lambda, including a non-commutative step") {
    graft.GraftExtensions.registerTemp(spark)
    val got = spark.sql(
      "SELECT array_scan(array('a', 'b', 'c'), '', (acc, x) -> concat(acc, x)) AS s")
      .collect()(0).getSeq[String](0)
    assert(got == Seq("a", "ab", "abc"))
  }

  test("array_scan rejects a step whose type differs from the zero") {
    graft.GraftExtensions.registerTemp(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT array_scan(array(1, 2), 0, (acc, x) -> CAST(acc + x AS STRING))").collect()
    }
    assert(e.getMessage.contains("zero type") || e.getMessage.contains("DATATYPE_MISMATCH"),
      s"unexpected error: ${e.getMessage}")
  }

  test("scanListCol null policy: null rows emit null and do not advance the state") {
    import graft.plumba.ExprOps
    val df = Seq((1L, 1, Option(2.0)), (1L, 2, Option.empty[Double]), (1L, 3, Option(3.0)))
      .toDF("g", "ord", "v")
    val got = df.groupBy("g")
      .agg(ExprOps.scanListCol(
        Seq(col("ord")), Seq(col("v")), lit(0.0),
        (acc, x) => acc + x.getField(ExprOps.v(0))).as("traj"))
      .collect()(0).getSeq[java.lang.Double](1)
    assert(got == Seq(2.0, null, 5.0))
  }
}
