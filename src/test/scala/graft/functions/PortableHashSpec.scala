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

  test("shingle_hash60: distinct word-bigram 60-bit hashes match the DuckDB hex parse") {
    // goldens = parse of substr(md5(shingle), 1, 15) as hex, validated
    // bit-equal against the DuckDB strpos/shift expression the oracles use
    val got = Seq("a b c d").toDF("text")
      .select(Dedup.shingleMd5($"text", n = 2).as("sh"))
      .collect()(0).getSeq[Long](0)
    assert(got == Seq(
      57593333306279187L,  // top60(md5("a b"))
      819617748153003362L, // top60(md5("b c"))
      753818583068856625L)) // top60(md5("c d"))
  }

  test("window_hash60: positional, duplicate-preserving, full windows only") {
    def wh(text: String, w: Int): Seq[Long] = Seq(text).toDF("text")
      .select(HashFunctions.windowHash60(split(lower($"text"), " +"), w).as("h"))
      .collect()(0).getSeq[Long](0)
    // bigram windows of "a b c d" are the bigram SHINGLES with positions:
    // same 60-bit md5 values as the shingle_hash60 goldens above
    assert(wh("a b c d", 2) == Seq(
      57593333306279187L, 819617748153003362L, 753818583068856625L))
    // duplicates are KEPT (within-doc repetition is the signal):
    // "a b a b" -> hashes of "a b", "b a", "a b"
    val dup = wh("a b a b", 2)
    assert(dup.length == 3 && dup(0) == dup(2) && dup(0) == 57593333306279187L)
    // documents shorter than one window emit nothing (no partial spans,
    // unlike shingle_hash60's min-1 rule)
    assert(wh("a b", 3).isEmpty)
    assert(wh("a b c", 3).length == 1)
  }

  test("minhash60: per-seed affine remix mod 2^60 matches the DuckDB HUGEINT replay") {
    val got = Seq("a b c d").toDF("text")
      .select(Dedup.minHashSignatureP(Dedup.shingleMd5($"text", n = 2), k = 4).as("sig"))
      .collect()(0).getSeq[Long](0)
    assert(got == Seq(
      135155355891906884L,
      21145301684782703L,
      364707280103988508L,
      327296478130551864L))
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

  test("degenerate text: empty and single-word docs hash without error, dedup end-to-end") {
    val docs = Seq((1L, ""), (2L, "word"), (3L, "word"), (4L, "a b")).toDF("doc_id", "text")
    // shingle set of a short doc is the truncated single shingle
    val sh = docs.select(Dedup.shingleMd5($"text", n = 3).as("s")).collect().map(_.getSeq[Long](0))
    assert(sh.forall(_.size == 1))
    assert(sh(1) == sh(2)) // identical docs -> identical shingle hashes
    // the full pair pipeline runs and finds the planted exact dup
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 3L)))
    // simhash bits of empty text: zero words -> majority over 0 -> all zeros
    val sig = docs.filter($"doc_id" === 1L)
      .select(Dedup.simHashBits($"text")).collect()(0).getString(0)
    // split("", " +") yields one empty token; md5("") bits decide the vote of n=1
    assert(sig.length == 64 && sig.forall(c => c == '0' || c == '1'))
  }

  test("portable signatures are partition-count independent (plane cache correctness)") {
    val df = (0 until 64).map(i => Tuple1(Array.tabulate(16)(d => ((i * 7 + d * 3) % 11 - 5) / 5.0f))).toDF("vec")
    val one = df.repartition(1).select(Similarity.hyperplaneSignature($"vec", 16).as("s")).collect().map(_.getString(0))
    val many = df.repartition(8).select(Similarity.hyperplaneSignature($"vec", 16).as("s")).collect().map(_.getString(0))
    assert(one.sorted.sameElements(many.sorted))
  }
}
