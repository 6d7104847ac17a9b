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

  test("heapEncodeWord == the sequential fold on every trained vocabulary word") {
    val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
    val trained = Bpe.train(docs, "text")
    val ranks = Bpe.buildRanks(trained.merges)
    val words = docs
      .select(explode(split(TextAnalysis.normalizeText(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().as[String].collect()
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(Bpe.heapEncodeWord(w, ranks) == Bpe.encodeWord(w, trained.merges), s"word '$w'")
    }
  }

  test("heap encoder honors the creation floor where a naive min-rank loop diverges") {
    // merges: rank 0 = (ab, c), rank 1 = (a, b). The sequential fold on
    // "abc" runs pass 0 first (pair absent: symbols are single chars),
    // then pass 1 -> [ab, c] — and NEVER revisits rank 0 even though
    // pass 1 just created an (ab, c) adjacency. A GPT-2-style
    // "repeatedly merge the lowest-rank pair present" loop would merge
    // it -> [abc]. The creation-floor rule reproduces the fold.
    val merges = Seq(("ab", "c"), ("a", "b"))
    assert(Bpe.encodeWord("abc", merges) == Vector("ab", "c"))
    assert(Bpe.heapEncodeWord("abc", Bpe.buildRanks(merges)) == Vector("ab", "c"))
  }

  test("heapEncodeWord == sequential fold on random words and ARBITRARY merge lists") {
    // adversarial generator: tokens are random strings over {a,b,c}
    // (multi-char pairs, token-string collisions, duplicate pairs all
    // reachable) — the full space where the two formulations could
    // disagree. Deterministic seed: differential must be replayable.
    val rnd = new scala.util.Random(20260814L)
    def tok() = (1 to (1 + rnd.nextInt(3))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    (1 to 800).foreach { i =>
      val word = (1 to rnd.nextInt(14)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val merges = (1 to rnd.nextInt(12)).map(_ => (tok(), tok()))
      val seqr = Bpe.encodeWord(word, merges)
      val heap = Bpe.heapEncodeWord(word, Bpe.buildRanks(merges))
      assert(heap == seqr, s"case $i word='$word' merges=$merges: heap=$heap fold=$seqr")
    }
  }

  test("distributed encode (pair-heap expression) == encodeChain on the fixture corpus") {
    val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
    val trained = Bpe.train(docs, "text")
    val rows = docs.select(
      array_join(Bpe.encode(col("text"), trained.merges), " ").as("heap"),
      array_join(Bpe.encodeChain(col("text"), trained.merges), " ").as("chain"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("distributed encode matches encodeChain on empty and whitespace-only text") {
    val merges = Seq(("a", "b"))
    val rows = Seq("", "   ", "ab").toDF("text").select(
      Bpe.encode(col("text"), merges).as("heap"),
      Bpe.encodeChain(col("text"), merges).as("chain"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (h, c) => assert(h == c) }
  }

  test("incremental trainer == full-recount reference on random weighted vocabularies") {
    // {a,b,c} over short words is maximal-tie territory — the heap's
    // lazy-invalidation argmax must match the scan's (−count, "a b")
    // minBy on every tie
    val rnd = new scala.util.Random(77L)
    (1 to 200).foreach { i =>
      val words = Array.fill(1 + rnd.nextInt(25)) {
        val w = (1 to (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        (w.map(_.toString).toVector, 1L + rnd.nextInt(5))
      }
      val m = 1 + rnd.nextInt(30)
      val fast = Bpe.trainMerges(words.map(identity), m)
      val ref = Bpe.trainMergesReference(words.map(identity), m)
      assert(fast == ref, s"case $i words=${words.toSeq} m=$m")
    }
  }

  test("packSequencesBy with the ws counter reproduces packSequences") {
    val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
    val a = TextAnalysis.packSequences(docs, "doc_id", "text", windowTokens = 512)
    val b = TextAnalysis.packSequencesBy(
      docs, "doc_id", TextAnalysis.tokenCountWs(col("text")).cast("long"), windowTokens = 512)
    assert(a.collect().toSeq == b.collect().toSeq)
  }
  test("heap expression == encodeChain on hostile unicode (emoji, CJK, combining marks)") {
    // the heap encoder splits words on CODE POINTS because the chain's
    // regexp spacing does — supplementary chars (surrogate pairs in
    // UTF-16) must stay single symbols on both paths
    val texts = Seq(
      "caf\u00e9 r\u00e9sum\u00e9 \u4e2d\u6587 \ud83d\ude00\ud83d\ude00 mixed\ud83d\ude00end",
      "e\u0301 combining e\u0301e\u0301",
      "\ud83d\ude00", "\u4e2d", "")
    val merges = Seq(("c", "a"), ("ca", "f"), ("\u4e2d", "\u6587"),
      ("\ud83d\ude00", "\ud83d\ude00"), ("e", "\u0301"))
    val rows = texts.toDF("text").select(
      array_join(Bpe.encode(col("text"), merges), "|").as("heap"),
      array_join(Bpe.encodeChain(col("text"), merges), "|").as("chain"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"heap='${r.getString(0)}' chain='${r.getString(1)}'"))
    // the emoji-pair merge actually fired (two U+1F600 became one token)
    val emoji = texts(0)
    val toks = Seq(emoji).toDF("text")
      .select(Bpe.encode(col("text"), merges)).as[Seq[String]].head()
    assert(toks.contains("\ud83d\ude00\ud83d\ude00"),
      s"surrogate-pair merge must fire: $toks")
  }

  test("byte mode: heap expression == encodeChainBytes on hostile unicode") {
    val texts = Seq(
      "caf\u00e9 r\u00e9sum\u00e9 \u4e2d\u6587 \ud83d\ude00\ud83d\ude00 mixed\ud83d\ude00end",
      "e\u0301 combining e\u0301e\u0301",
      "\ud83d\ude00", "\u4e2d", "", "plain ascii words")
    // merges over HEX-PAIR symbols: 'c'+'a' bytes, the e-acute UTF-8
    // pair (C3 A9), and the first two bytes of U+1F600 (F0 9F)
    val merges = Seq(("63", "61"), ("C3", "A9"), ("F0", "9F"), ("F09F", "98"))
    val rows = texts.toDF("text").select(
      array_join(Bpe.encodeBytes(col("text"), merges), "|").as("heap"),
      array_join(Bpe.encodeChainBytes(col("text"), merges), "|").as("chain"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"heap='${r.getString(0)}' chain='${r.getString(1)}'"))
  }

  test("byte mode: zero-OOV is structural \u2014 every token resolves to an id; code-point mode cannot") {
    import graft.queries.Tables
    val docs = Tables(spark, TestSpark.sfDir, "documents")
    val hostile = Seq("\ud83d\ude80 zalgo \u4f60\u597d \u00fcml\u00e4ut").toDF("text")
    val corpus = docs.select(col("text")).unionAll(hostile)
      .filter(length(TextAnalysis.normalizeText(col("text"))) > 0)
    val byteTrained = Bpe.trainBytes(docs, "text")
    val byteUnknown = corpus
      .select(explode(Bpe.tokenIds(
        Bpe.encodeBytes(col("text"), byteTrained.merges), byteTrained)).as("id"))
      .filter(col("id") < 0).count()
    assert(byteUnknown == 0, "byte mode must cover any UTF-8 input")
    // contrast: the code-point tokenizer's collected alphabet cannot
    // cover characters the corpus never contained
    val cpTrained = Bpe.train(docs, "text")
    val cpUnknown = corpus
      .select(explode(Bpe.tokenIds(
        Bpe.encode(col("text"), cpTrained.merges), cpTrained)).as("id"))
      .filter(col("id") < 0).count()
    assert(cpUnknown > 0, "if code-point mode covers hostile text the contrast is vacuous")
  }

  test("byte mode: trained alphabet is the full 256-byte table with ids = byte value") {
    assert(Bpe.ByteAlphabet.length == 256)
    assert(Bpe.ByteAlphabet(0) == "00" && Bpe.ByteAlphabet(255) == "FF")
    val t = Bpe.Trained(Bpe.ByteAlphabet, Seq(("61", "62")))
    assert(t.vocab("00") == 0 && t.vocab("FF") == 255 && t.vocab("6162") == 256)
    // hexPairs round-trips multi-byte UTF-8 exactly as hex() spells it
    assert(Bpe.hexPairs("\u00e9").toSeq == Seq("C3", "A9"))
    assert(Bpe.hexPairs("\ud83d\ude00").toSeq == Seq("F0", "9F", "98", "80"))
  }
}
