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

  test("string keys: bloom semi join == exact semi join on content hashes") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select($"doc_id", md5(lower($"text")).as("h"))
    val build = docs.filter($"doc_id" % 7 === 0).select($"h".as("bh"))
    val bloom = BloomJoin.semiJoin(docs, build, "h", "bh")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val exact = docs.join(build, $"h" === $"bh", "left_semi")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(bloom.nonEmpty && bloom.sameElements(exact))
  }

  test("string build inserts UTF-8 bytes: putString == putBinary(utf8) (probe-side premise)") {
    // the expression probes with mightContainBinary(UTF8String.getBytes);
    // pin that Spark's builder made that equivalent to putString
    val df = Seq("alpha", "beta", "γάμμα").toDF("s")
    val bf = df.stat.bloomFilter("s", 100, 0.01)
    for (s <- Seq("alpha", "beta", "γάμμα")) {
      assert(bf.mightContainString(s))
      assert(bf.mightContainBinary(s.getBytes("UTF-8")))
      assert(bf.mightContainBinary(
        org.apache.spark.unsafe.types.UTF8String.fromString(s).getBytes))
    }
  }

  test("int keys widen to long; unsupported types are rejected with a clear contract error") {
    val probeI = Seq((1, "x"), (2, "y"), (9, "z")).toDF("k", "v")
    val buildI = Seq(2, 9).toDF("bk")
    val got = BloomJoin.semiJoin(probeI, buildI, "k", "bk").collect().map(_.getInt(0)).toSet
    assert(got == Set(2, 9))
    val probeD = Seq((1.5, 1)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(probeD, probeD.select($"k".as("bk")), "k", "bk")
    }
    // mixed families (string probe vs long build) can never match — rejected
    val probeS = Seq(("1", 1)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(probeS, buildI, "k", "bk")
    }
  }
}
