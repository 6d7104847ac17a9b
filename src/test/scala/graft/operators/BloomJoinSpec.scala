package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom semi join == exact semi join (false positives removed, no false negatives)") {
    val o = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val r = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
      .filter($"l_returnflag" === "R").select("l_orderkey")
    val bloom = BloomJoin.semiJoin(o, r, "o_orderkey", "l_orderkey")
      .collect().map(_.getLong(0)).sorted
    val exact = o.join(r, $"o_orderkey" === $"l_orderkey", "left_semi")
      .collect().map(_.getLong(0)).sorted
    assert(bloom.sameElements(exact))
  }

  test("a deliberately tiny/high-fpp sketch still yields exact results (only pruning degrades)") {
    val probe = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "v")
    val build = Seq(3L, 500L, 999L).toDF("bk")
    val got = BloomJoin.semiJoin(probe, build, "k", "bk", expectedItems = 2L, fpp = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(3L, 500L, 999L))
  }

  test("non-long keys are rejected with a clear contract error") {
    val probe = Seq(("a", 1)).toDF("k", "v")
    val build = Seq("a").toDF("bk")
    intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(probe, build, "k", "bk")
    }
  }
}
