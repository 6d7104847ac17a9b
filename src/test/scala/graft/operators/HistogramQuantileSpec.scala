package graft.operators

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** HistogramQuantile vs the discrete-quantile definition applied to the
  * sorted data directly: boundary(q) = sorted(ceil(q*n) - 1). */
class HistogramQuantileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop, cases: Int): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  private def refBoundary(values: Seq[Long], q: Double): Long = {
    val sorted = values.sorted
    // smallest v with |{x <= v}| >= q*n == the ceil(q*n)-th order statistic
    val k = math.ceil(q * sorted.length - 1e-9).toInt
    sorted(math.max(k, 1) - 1)
  }

  test("per-group boundaries == sorted-order-statistic reference") {
    val genVals = Gen.nonEmptyListOf(Gen.zip(Gen.choose(1, 3), Gen.choose(0L, 30L)))
    val genQ = Gen.oneOf(0.05, 0.25, 0.5, 0.75, 0.95, 1.0)
    check(Prop.forAll(genVals, genQ) { (kvs, q) =>
      val df = kvs.toDF("g", "v")
      val got = HistogramQuantile.boundaries(df, Seq("g"), "v", Seq(("b", q)))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val want = kvs.groupBy(_._1).map { case (g, xs) => g -> refBoundary(xs.map(_._2), q) }
      got == want
    }, cases = 20)
  }

  test("global boundaries (no group) and null exclusion") {
    val df = Seq[(Option[Long], Int)](
      (Some(1L), 0), (Some(2L), 0), (Some(3L), 0), (Some(4L), 0), (None, 0))
      .toDF("v", "dummy")
    val row = HistogramQuantile.boundaries(df, Nil, "v", Seq(("p50", 0.5), ("p100", 1.0)))
      .collect().head
    assert(row.getLong(row.fieldIndex("p50")) == 2L)   // ceil(0.5*4)=2nd of [1,2,3,4]
    assert(row.getLong(row.fieldIndex("p100")) == 4L)
    assert(row.getLong(row.fieldIndex("n_rows")) == 4L) // null excluded
  }
  test("the cardinality cap trips loudly on a high-cardinality near-continuous column") {
    // 10k distinct values against a cap of 100: the histogram IS the
    // table here, which is exactly the misuse the cap exists to refuse
    val df = spark.range(10000).toDF("v")
    val ex = intercept[Exception] {
      HistogramQuantile.boundaries(df, Nil, "v", Seq(("p50", 0.5)), maxDistinct = 100).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("distinct")),
      s"cap failure must name the cardinality contract: ${ex.getMessage}")
    // same data under the default cap (1M) is fine
    val ok = HistogramQuantile.boundaries(df, Nil, "v", Seq(("p50", 0.5))).collect().head
    assert(ok.getLong(ok.fieldIndex("p50")) == 4999L)
  }

  test("the cap guards the per-group path too") {
    import org.apache.spark.sql.functions.col
    val df = spark.range(400).select((col("id") % 2).as("g"), col("id").as("v"))
    intercept[Exception] {
      HistogramQuantile.boundaries(df, Seq("g"), "v", Seq(("p50", 0.5)), maxDistinct = 50).collect()
    }
    // under the cap: 200 distinct per group passes
    val rows = HistogramQuantile.boundaries(df, Seq("g"), "v", Seq(("p50", 0.5)), maxDistinct = 200)
      .collect()
    assert(rows.length == 2)
  }
}
