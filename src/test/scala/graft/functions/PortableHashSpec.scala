package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.{Dedup, Similarity}

/** Cross-engine golden tests for the PORTABLE (md5-derived) hash family.
  *
  * Every golden value below was computed in DuckDB 1.0 with the exact SQL
  * the correctness oracles use (strpos/substr bit slicing, min(md5(..)),
  * integer hyperplane projections) — so these tests pin the Spark
  * expressions to the oracle's arithmetic, not to themselves. If either
  * side drifts, the catalog queries stop hash-matching; this spec fails
  * first with a readable diff.
  */
class PortableHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shingle_md5: distinct word-bigram md5 hexes match DuckDB md5()") {
    val got = Seq("a b c d").toDF("text")
      .select(Dedup.shingleMd5($"text", n = 2).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq(
      "0cc9cd4dd26c5137b675a0d819cb9ab0", // md5("a b")
      "b5fddffda43ed626a60026ef9d18ced2", // md5("b c")
      "a761a01e4e85131529c1b1948648cd9a")) // md5("c d")
  }

  test("minhash_md5: per-seed min(md5(s:h)) matches the DuckDB GROUP BY replay") {
    val got = Seq("a b c d").toDF("text")
      .select(Dedup.minHashSignatureP(Dedup.shingleMd5($"text", n = 2), k = 4).as("sig"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq(
      "608ff70789f5d796848b32f87da4ab73",
      "05b3345274d4c0662b91c3bcabe6b1f5",
      "268ee9f15d1657ff56a70cdba56fc1be",
      "187d0aa3420a45d892a1580c72d2a7f4"))
  }

  test("simhash_bits: md5 nibble-bit majority vote matches DuckDB strpos arithmetic") {
    val got = Seq("hello world").toDF("text")
      .select(Dedup.simHashBits($"text").as("sig"))
      .collect()(0).getString(0)
    assert(got == "1010101100101000000000000100010001010000001001000000000000000110")
    // identical docs -> identical signatures -> hamming 0
    val h = Seq(("hello world", "hello world")).toDF("a", "b")
      .select(Dedup.hammingBits(Dedup.simHashBits($"a"), Dedup.simHashBits($"b")))
      .collect()(0).getInt(0)
    assert(h == 0)
  }

  test("hamming_bits counts differing positions") {
    val h = Seq(("10110", "00111")).toDF("a", "b")
      .select(Dedup.hammingBits($"a", $"b")).collect()(0).getInt(0)
    assert(h == 2)
  }

  test("quantized hyperplane signature matches DuckDB integer-projection replay") {
    val got = Seq(Tuple1(Array(0.5f, -0.5f))).toDF("vec")
      .select(Similarity.hyperplaneSignature($"vec", nPlanes = 8).as("sig"))
      .collect()(0).getString(0)
    assert(got == "11100111")
  }

  test("portable signatures are partition-count independent (plane cache correctness)") {
    val df = (0 until 64).map(i => Tuple1(Array.tabulate(16)(d => ((i * 7 + d * 3) % 11 - 5) / 5.0f))).toDF("vec")
    val one = df.repartition(1).select(Similarity.hyperplaneSignature($"vec", 16).as("s")).collect().map(_.getString(0))
    val many = df.repartition(8).select(Similarity.hyperplaneSignature($"vec", 16).as("s")).collect().map(_.getString(0))
    assert(one.sorted.sameElements(many.sorted))
  }
}
