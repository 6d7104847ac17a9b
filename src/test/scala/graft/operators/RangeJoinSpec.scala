package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("point-in-interval: boundaries inclusive, multi-bucket intervals, no duplicate pairs") {
    val points = Seq((1L, 0.0), (2L, 10.0), (3L, 25.0), (4L, 99.9), (5L, 100.0)).toDF("pid", "p")
    // interval B spans many buckets at width 10 — the pair must appear ONCE
    val ivals = Seq(("A", 0.0, 10.0), ("B", 5.0, 99.9), ("C", 100.0, 100.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivals, "p", "lo", "hi", 10.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.length == got.distinct.length, "bucketing must not duplicate pairs")
    assert(got.toSet == Set(
      (1L, "A"), (2L, "A"),            // boundaries inclusive both ends
      (2L, "B"), (3L, "B"), (4L, "B"), // multi-bucket interval
      (5L, "C")))                      // degenerate single-point interval
  }

  test("differential vs the naive non-equi join on real orders data") {
    val o = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val bands = spark.range(0, 20).select(
      col("id").as("band_id"),
      (col("id") * 25000.0).as("lo"),
      ((col("id") + 1) * 25000.0 - 0.01).as("hi"))
    val bucketed = RangeJoin.pointInInterval(o, bands, "o_totalprice", "lo", "hi", 25000.0)
      .select("o_orderkey", "band_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = o.join(bands, col("o_totalprice") >= col("lo") && col("o_totalprice") <= col("hi"))
      .select("o_orderkey", "band_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
    assert(bucketed.size == o.count()) // every order falls in exactly one band
  }
}
