package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Bpe]] — deterministic trainer + the compiled double-spaced replace
  * encoder. The load-bearing claims: training is reproducible with the
  * documented tie-break, the merge application is Sennrich left-to-right
  * NON-OVERLAPPING in merge ORDER, and the Column encoder is
  * word-for-word identical to the driver-side reference fold (the
  * equivalence the oracle replay then re-verifies in DuckDB). */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("train: hand-computed merges on a tiny corpus, early stop when pairs exhaust") {
    val df = Seq("aa ab", "aa aa").toDF("text")
    val t = Bpe.train(df, "text", vocabWords = 10, numMerges = 5)
    // wf: aa->3, ab->1. Round 1: (a,a)=3 beats (a,b)=1. Round 2: only
    // (a,b) remains. Round 3: no pairs left -> stops at 2 merges.
    assert(t.merges == Seq(("a", "a"), ("a", "b")))
    assert(t.alphabet == Seq("a", "b"))
    // ids: alphabet first (sorted), then merge outputs in training order
    assert(t.vocab == Map("a" -> 0, "b" -> 1, "aa" -> 2, "ab" -> 3))
  }

  test("train: count ties break on the pair string ascending (the oracle's ORDER BY)") {
    // one word "abcb" f=1: pairs (a,b)=1 (b,c)=1 (c,b)=1 -> tie, "a b" wins
    val t = Bpe.train(Seq("abcb").toDF("text"), "text", numMerges = 1)
    assert(t.merges == Seq(("a", "b")))
  }

  test("applyMerge is left-to-right non-overlapping (Sennrich semantics)") {
    def enc(w: String, ms: (String, String)*) = Bpe.encodeWord(w, ms).mkString(" ")
    assert(enc("aaaa", ("a", "a")) == "aa aa")
    assert(enc("aaa", ("a", "a")) == "aa a")
    assert(enc("aaaaa", ("a", "a")) == "aa aa a")
    // merge ORDER matters: (b,c) first consumes the b that (a,b) wanted
    assert(enc("abc", ("b", "c"), ("a", "b")) == "a bc")
    assert(enc("abc", ("a", "b"), ("b", "c")) == "ab c")
    // chained merges build multi-char tokens
    assert(enc("abab", ("a", "b"), ("ab", "ab")) == "abab")
  }

  test("Column encode == driver encodeWord on every trained vocabulary word") {
    val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
    val trained = Bpe.train(docs, "text")
    assert(trained.merges.size == Bpe.NumMerges)
    val words = docs
      .select(explode(split(TextAnalysis.normalizeText(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().as[String].collect().sorted
    assert(words.nonEmpty)
    val got = words.toSeq.toDF("text")
      .select(array_join(Bpe.encode(col("text"), trained.merges), " "))
      .as[String].collect()
    words.zip(got).foreach { case (w, enc) =>
      assert(enc == Bpe.encodeWord(w, trained.merges).mkString(" "), s"word '$w'")
    }
  }

  test("encode spans words never: merges apply within each word only") {
    // merge (b,c) must not fire across the "ab cd" word boundary
    val out = Seq("ab ca").toDF("text")
      .select(array_join(Bpe.encode(col("text"), Seq(("b", "c"))), " "))
      .as[String].head()
    assert(out == "a b c a")
  }

  test("tokenIds: unknown symbols map to -1, known tokens to trained ids") {
    val trained = Bpe.Trained(Seq("a", "b"), Seq(("a", "b")))
    val ids = Seq("ab xa").toDF("text")
      .select(Bpe.tokenIds(Bpe.encode(col("text"), trained.merges), trained))
      .as[Seq[Int]].head()
    // "ab" -> id 2; "x" unknown -> -1; "a" -> 0
    assert(ids == Seq(2, -1, 0))
  }

  test("packSequencesBy with the ws counter reproduces packSequences") {
    val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
    val a = TextAnalysis.packSequences(docs, "doc_id", "text", windowTokens = 512)
    val b = TextAnalysis.packSequencesBy(
      docs, "doc_id", TextAnalysis.tokenCountWs(col("text")).cast("long"), windowTokens = 512)
    assert(a.collect().toSeq == b.collect().toSeq)
  }
}
