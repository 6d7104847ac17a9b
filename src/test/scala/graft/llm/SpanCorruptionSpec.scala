package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[TextAnalysis.spanCorruption]] — T5-style denoising data prep.
  * Pins the hash mask rule and sentinel numbering against a
  * plain-Scala replay, and the LOSSLESS property: splicing each
  * target span back over its sentinel reconstructs the normalized
  * document exactly. */
class SpanCorruptionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private lazy val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
  private lazy val out = TextAnalysis.spanCorruption(docs, "doc_id", "text")
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4), r.getString(5)))
  private lazy val norms = docs.select(col("doc_id"),
      TextAnalysis.normalizeText(col("text")).as("nt"))
    .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("mask rule and sentinel numbering replay in plain Scala") {
    out.take(50).foreach { case (id, nWords, nSpans, nMasked, input, target) =>
      val ws = norms(id).split(" ", -1)
      assert(nWords === ws.length)
      val nBlocks = (ws.length - 1) / 3 + 1
      val mask = (0 until nBlocks).map(b => h60(s"span:$id:$b") % 1000 < 150)
      assert(nSpans === mask.count(identity))
      assert(nMasked === ws.indices.count(i => mask(i / 3)))
      var k = -1
      val inp = ws.indices.flatMap { i =>
        if (!mask(i / 3)) Some(ws(i))
        else if (i % 3 == 0) { k += 1; Some(s"<extra_id_$k>") }
        else None
      }.mkString(" ")
      assert(input === inp, s"doc $id input")
      var k2 = -1
      val tgt = ws.indices.flatMap { i =>
        if (!mask(i / 3)) None
        else if (i % 3 == 0) { k2 += 1; Some(s"<extra_id_$k2> ${ws(i)}") }
        else Some(ws(i))
      }.mkString(" ")
      assert(target === tgt, s"doc $id target")
    }
  }

  test("lossless: splicing target spans over their sentinels reconstructs the doc") {
    out.foreach { case (id, _, nSpans, _, input, target) =>
      // parse target into sentinel -> words
      val spans = scala.collection.mutable.Map.empty[Int, List[String]]
      var cur = -1
      target.split(" ", -1).filter(_.nonEmpty).foreach { t =>
        if (t.startsWith("<extra_id_")) { cur = t.stripPrefix("<extra_id_").stripSuffix(">").toInt; spans(cur) = Nil }
        else spans(cur) = spans(cur) :+ t
      }
      assert(spans.size === nSpans, s"doc $id sentinel count")
      val rebuilt = input.split(" ", -1).filter(_.nonEmpty).flatMap { t =>
        if (t.startsWith("<extra_id_"))
          spans(t.stripPrefix("<extra_id_").stripSuffix(">").toInt)
        else Seq(t)
      }.mkString(" ")
      val expect = norms(id).split(" ", -1).filter(_.nonEmpty).mkString(" ")
      assert(rebuilt === expect, s"doc $id does not reconstruct")
    }
  }

  test("NULL text drops the doc — matching a SQL engine's unnest-over-NULL") {
    import spark.implicits._
    val withNull = docs.select(col("doc_id"), col("text"))
      .unionAll(Seq((9999999L, null.asInstanceOf[String]),
                    (9999998L, "alpha beta gamma delta")).toDF("doc_id", "text"))
    val ids = TextAnalysis.spanCorruption(withNull, "doc_id", "text")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(9999999L), "NULL-text doc must vanish, not emit a NULL row")
    assert(ids.contains(9999998L), "non-null sibling must survive the guard")
  }

  test("corruption rate lands near maskMilli and spans never overlap by construction") {
    val total = out.map(_._2).sum.toDouble
    val masked = out.map(_._4).sum.toDouble
    val rate = masked / total
    assert(rate > 0.08 && rate < 0.25, s"corruption rate $rate far from 0.15")
    // block granularity: masked words per span <= spanWords
    out.foreach { case (id, _, nSpans, nMasked, _, _) =>
      assert(nMasked <= nSpans * 3, s"doc $id span overflow")
    }
  }
}
