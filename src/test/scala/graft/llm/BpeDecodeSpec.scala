package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Bpe]] decode — the inverse direction: ids → tokens → text.
  * Pins the inverse-table contract, byte-mode structural losslessness
  * on hostile unicode (driver replay AND the Spark column path), and
  * the loud-null policy for unknown ids in code-point mode. */
class BpeDecodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
  private lazy val trainedB = Bpe.trainBytes(docs, "text")
  private lazy val trainedC = Bpe.train(docs, "text")

  private val hostile = Seq(
    "café über straße naïve",
    "你好世界 日本語テスト",
    "😀🚀 emoji 🎉 mix",
    "mixed ascii with émojis 🤖 tail")

  test("idToToken is the exact inverse of the id assignment, duplicates included") {
    val inv = Bpe.idToToken(trainedB)
    val nA = trainedB.alphabet.size
    trainedB.alphabet.zipWithIndex.foreach { case (tk, id) => assert(inv(id) === tk) }
    trainedB.merges.zipWithIndex.foreach { case ((a, b), j) => assert(inv(nA + j) === a + b) }
    // every id tokenIds can emit decodes back to a token whose vocab id
    // round-trips (min-id rule: vocab(inv(id)) <= id)
    inv.foreach { case (id, tk) => assert(trainedB.vocab(tk) <= id) }
  }

  test("byte mode: decode(encode(x)) == x for every hostile word, driver replay") {
    val ranks = Bpe.buildRanks(trainedB.merges)
    val inv = Bpe.idToToken(trainedB)
    hostile.flatMap(_.toLowerCase.split(" ")).filter(_.nonEmpty).foreach { w =>
      val toks = Bpe.heapEncodeWordBytes(w, ranks)
      val ids = toks.map(t => trainedB.vocab(t)) // byte mode: never missing
      val hex = ids.map(inv).mkString("")
      val decoded = new String(
        hex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray, "UTF-8")
      assert(decoded === w, s"word '$w'")
    }
  }

  test("byte mode, Spark column path: id round trip reconstructs hostile text exactly") {
    val df = hostile.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val norm = TextAnalysis.normalizeText(col("text"))
    val arr = transform(split(norm, " "), w =>
      Bpe.decodeIdsBytes(Bpe.tokenIds(Bpe.encodeBytes(w, trainedB.merges), trainedB), trainedB))
    val out = df.select(col("id"), norm.as("nt"),
        when(exists(arr, a => a.isNull), lit(null).cast("string"))
          .otherwise(array_join(arr, " ")).as("decoded"))
      .collect()
    out.foreach { r =>
      assert(!r.isNullAt(2), s"row ${r.getLong(0)} failed to decode")
      assert(r.getString(2) === r.getString(1), s"row ${r.getLong(0)}")
    }
  }

  test("code-point mode: unknown ids NULL the decode — never a wrong reconstruction") {
    val df = Seq((0L, "你好 emoji")).toDF("id", "text") // 你好 chars unseen by training
    val norm = TextAnalysis.normalizeText(col("text"))
    val arr = transform(split(norm, " "), w =>
      Bpe.decodeIds(Bpe.tokenIds(Bpe.encode(w, trainedC.merges), trainedC), trainedC))
    val out = df.select(arr.as("a")).head.getSeq[String](0)
    assert(out.head == null, "the unseen-char word must decode to null")
  }

  test("structural byte-mode id maps are differential twins of the generic maps") {
    val df = (hostile ++ Seq("plain ascii words", "")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val toks = Bpe.encodeBytes(col("text"), trainedB.merges)
    val rows = df.select(
        Bpe.tokenIds(toks, trainedB).as("generic"),
        Bpe.tokenIdsBytes(toks, trainedB).as("structural"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Int](0) === r.getSeq[Int](1)))
    // inverse: every id both maps decode identically (round-trip ids,
    // plus the -1 marker which must null in both)
    val ids = typedLit(Seq(0, 65, 255, 256, 256 + trainedB.merges.length - 1, -1))
    val inv = spark.range(1).select(
        Bpe.idsToTokens(ids, trainedB).as("g"),
        Bpe.idsToTokensBytes(ids, trainedB).as("s"))
      .head
    assert(inv.getSeq[String](0) === inv.getSeq[String](1))
    assert(inv.getSeq[String](0).last == null)
  }

  test("bpe_fertility_by_source: ppm arithmetic replays; byte mode always >= 1 token per word") {
    val out = graft.queries.LlmQueries.bpeFertilityBySource(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(out.nonEmpty)
    out.foreach { case (src, nDocs, w, t, b, fert, bpt) =>
      assert(nDocs > 0 && w > 0 && t > 0 && b > 0, s"$src empties")
      assert(fert === t * 1000000L / w, s"$src fertility arithmetic")
      assert(bpt === b * 1000000L / t, s"$src bytes-per-token arithmetic")
      // a word is at least one byte-mode token; a token covers >= 1 byte
      assert(fert >= 1000000L, s"$src fertility below 1 token/word")
      assert(bpt >= 1000000L, s"$src token covering more bytes than exist")
    }
  }

  test("bpe_decode_roundtrip gate: hashes match normalization, hostile rows split by mode") {
    val out = graft.queries.LlmQueries.bpeDecodeRoundtrip(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val (host, corp) = out.partition(_._1 >= 1000000L)
    assert(host.nonEmpty && corp.nonEmpty)
    // byte-mode decode matched md5(norm) is proven by the oracle gate;
    // here pin the cp contrast: every hostile row is cp-undecodable,
    // corpus rows (the alphabet source) all decode
    assert(host.forall(_._4 === 0), s"hostile rows must be cp_decodable=0: $host")
    assert(corp.forall(_._4 === 1))
    assert(out.forall(_._2 > 0))
  }
}
