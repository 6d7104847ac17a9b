package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Unigram]] — the SentencePiece-style hard-EM trainer. Pins the
  * determinism contract the oracle replays (tie-breaks, coverage,
  * prune), the lossless-segmentation property, and the fertility
  * plumbing. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
  private lazy val trained = Unigram.train(docs, "text")

  private lazy val corpusWords: Seq[(String, Long)] = docs
    .select(explode(split(TextAnalysis.normalizeText(col("text")), " ")).as("w"))
    .filter(length(col("w")) > 0)
    .groupBy("w").agg(count(lit(1)).as("f"))
    .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("coverage: every corpus character is a piece with count >= 1 — Viterbi is total") {
    val chars = corpusWords.flatMap(_._1.toSeq).map(_.toString).toSet
    chars.foreach { ch =>
      assert(trained.counts.getOrElse(ch, 0L) >= 1L, s"alphabet char '$ch' pruned")
    }
    corpusWords.foreach { case (w, _) =>
      val seg = Unigram.viterbi(w, trained.scores)
      assert(seg.mkString === w, s"segmentation of '$w' is lossy: $seg")
      assert(seg.forall(trained.counts.contains), s"'$w' used an unvocabed piece")
    }
  }

  test("prune: every multi-char piece survived on genuine Viterbi usage") {
    val sc = trained.scores
    val used = scala.collection.mutable.Set.empty[String]
    // final-round usage re-derived: segment the TRAINING words under the
    // final scores' PREVIOUS round is internal, but any surviving
    // multi-char piece must at least occur inside some training word
    val top = corpusWords.sortBy { case (w, f) => (-f, w) }.take(Unigram.VocabWords)
    trained.counts.keys.filter(_.length > 1).foreach { p =>
      assert(top.exists(_._1.contains(p)), s"piece '$p' occurs in no training word")
      assert(p.length <= Unigram.MaxPieceLen)
    }
    top.foreach { case (w, _) => Unigram.viterbi(w, sc).foreach(used += _) }
    assert(used.exists(_.length > 1), "no multi-char piece is ever used — degenerate training")
  }

  test("scores are the integer floor-log2 rule and never positive") {
    val b = 63 - java.lang.Long.numberOfLeadingZeros(trained.total)
    trained.counts.foreach { case (p, c) =>
      val expect = (63 - java.lang.Long.numberOfLeadingZeros(c)) - b
      assert(trained.scores(p) === expect.toInt, s"piece '$p' score")
      assert(trained.scores(p) <= 0, s"piece '$p' has positive score")
    }
  }

  test("Viterbi tie-break prefers the longer piece; higher-scoring split still wins") {
    // tie: 'a'+'b' = -2 equals 'ab' = -2 -> the single longer piece wins
    val tie = Map("a" -> -1, "b" -> -1, "ab" -> -2)
    assert(Unigram.viterbi("ab", tie) === Vector("ab"))
    // no tie: the split (-1 + -1 = -2) beats the long piece (-5)
    val split = Map("a" -> -1, "b" -> -1, "ab" -> -5)
    assert(Unigram.viterbi("ab", split) === Vector("a", "b"))
    // longer context: 'abc' as 'ab'+'c' (-3) vs 'a'+'bc' (-2) -> max wins
    val mid = Map("a" -> -1, "b" -> -9, "c" -> -1, "ab" -> -2, "bc" -> -1)
    assert(Unigram.viterbi("abc", mid) === Vector("a", "bc"))
    assert(Unigram.viterbi("", tie) === Vector.empty)
  }

  test("OOV characters degrade to single-char fallback pieces, never crash") {
    val seg = Unigram.viterbi("aXb", Map("a" -> -1, "b" -> -1))
    assert(seg === Vector("a", "X", "b"))
    // Two+ consecutive OOV chars: the old Int.MinValue/4 sentinel summed
    // to exactly NegInf here and looped the backward walk forever.
    assert(Unigram.viterbi("aXYb", Map("a" -> -1, "b" -> -1)) ===
      Vector("a", "X", "Y", "b"))
    assert(Unigram.viterbi("XYZW", Map("a" -> -1)) ===
      Vector("X", "Y", "Z", "W"))
    // A scored multi-char piece still beats fallback chars around it.
    assert(Unigram.viterbi("XabY", Map("a" -> -1, "b" -> -1, "ab" -> -1)) ===
      Vector("X", "ab", "Y"))
  }

  test("pieceCounts appends the exact per-doc Viterbi piece sum, columns ride through") {
    val base = docs.limit(20).select(col("doc_id"), col("source"),
      TextAnalysis.normalizeText(col("text")).as("nt"))
    val out = Unigram.pieceCounts(base, "nt", trained).collect()
    assert(out.nonEmpty && out.head.schema.fieldNames.toSeq ===
      Seq("doc_id", "source", "nt", "n_pieces"))
    out.foreach { r =>
      val expect = r.getString(2).split(" ", -1)
        .map(w => Unigram.viterbi(w, trained.scores).length.toLong).sum
      assert(r.getLong(3) === expect, s"doc ${r.getLong(0)} piece count")
    }
  }

  test("segmentation renders exact boundaries and is lossless back to the normalized text") {
    val base = docs.limit(30).select(col("doc_id"),
      TextAnalysis.normalizeText(col("text")).as("nt"))
    val out = Unigram.segmentation(base, "nt", trained, "seg")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    out.foreach { case (id, nt, seg) =>
      val expect = nt.split(" ", -1)
        .map(w => Unigram.viterbi(w, trained.scores).mkString("/")).mkString(" ")
      assert(seg === expect, s"doc $id segmentation")
      assert(seg.replace("/", "") === nt, s"doc $id lossy segmentation")
    }
  }

  test("the comparison the operator exists for: unigram fertility differs from BPE's") {
    val f = graft.queries.LlmQueries.unigramFertility(spark, TestSpark.sfDir).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      val uni = r.getLong(5); val bpe = r.getLong(6)
      assert(uni > 1000000 && bpe > 1000000, "both tokenizers must fragment (fertility > 1)")
      assert(uni !== bpe, s"source ${r.getString(0)}: identical fertility is a wiring bug")
    }
  }

  test("vocab transplant: the mapping is consistent and covers the shared alphabet") {
    val rows = graft.queries.LlmQueries.vocabTransplant(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)), r.getString(3)))
    assert(rows.nonEmpty)
    val bpe = graft.queries.LlmQueries.trainedBpe(spark, TestSpark.sfDir)
    rows.foreach { case (piece, _, bpeId, status) =>
      assert((status == "mapped") === bpeId.isDefined, s"piece '$piece' status/id mismatch")
      bpeId.foreach { id =>
        assert(bpe.vocab.get(piece).contains(id),
          s"piece '$piece' mapped to id $id but BPE says ${bpe.vocab.get(piece)}")
      }
    }
    // both tokenizers derive their alphabet from the same normalized
    // corpus, so every single-char unigram piece must map
    rows.filter(_._1.length == 1).foreach { case (piece, _, bpeId, _) =>
      assert(bpeId.isDefined, s"alphabet char '$piece' must exist in the BPE vocabulary")
    }
    // and the mapping must be non-trivial in both directions
    assert(rows.exists(_._4 == "mapped") && rows.exists(_._4 == "unmapped"),
      "a transplant report with only one class is a wiring bug on this corpus")
  }

  test("fertility sweep: halving the prune budget never IMPROVES fertility, and costs somewhere") {
    val sw = graft.queries.LlmQueries.unigramFertilitySweep(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(5)))
    val by60 = sw.filter(_._1 == 60).map(t => t._2 -> t._3).toMap
    val by120 = sw.filter(_._1 == 120).map(t => t._2 -> t._3).toMap
    assert(by60.keySet === by120.keySet && by60.nonEmpty)
    // the kp=120 vocabulary is NOT a superset of kp=60's (EM prunes
    // differently), so per-source monotonicity is not a theorem — but
    // a smaller budget improving fertility EVERYWHERE means the sweep
    // wired the trainings backwards, and the aggregate must cost
    val worse = by60.count { case (src, f60) => f60 > by120(src) }
    val better = by60.count { case (src, f60) => f60 < by120(src) }
    assert(worse >= better, s"kp=60 better on $better sources, worse on $worse — wiring?")
    assert(by60.values.sum > by120.values.sum,
      "halving the budget must cost fertility in aggregate")
  }
}
