package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[TextAnalysis.dpoPairs]] — preference-pair prep. Pins the ALIGNMENT
  * contract DPO training depends on (both branches share the exact
  * prompt region and mask prefix), the shared-cut truncation algebra on
  * asymmetric branches, and the plain-Scala replay. */
class DpoPairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val MaxTok = 64

  private def norm(s: String): Array[String] =
    s.toLowerCase.replaceAll("[.,;:!?]", "").replaceAll(" +", " ").trim
      .split(" ", -1).filter(_.nonEmpty)

  private lazy val out = graft.queries.LlmQueries.dpoPairsQ(spark, TestSpark.sfDir)
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3), r.getString(4),
      r.getString(5), r.getString(6), r.getInt(7), r.getInt(8)))
  private lazy val texts = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
    .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("alignment: both branches share the exact prompt region and mask prefix") {
    out.foreach { case (id, npk, _, ct, cm, rt, rm, _, _) =>
      val cToks = ct.split(" ", -1); val rToks = rt.split(" ", -1)
      val prefixLen = npk + 2 // <|user|> + kept prompt + <|assistant|>
      assert(cToks.take(prefixLen).toSeq === rToks.take(prefixLen).toSeq,
        s"doc $id branches diverge inside the shared prompt")
      assert(cToks(prefixLen - 1) === "<|assistant|>")
      assert(cm.take(prefixLen) === "0" * prefixLen && rm.take(prefixLen) === "0" * prefixLen,
        s"doc $id mask prefix")
      assert(cm.length === cToks.length && rm.length === rToks.length, s"doc $id mask align")
      assert(cToks.length <= MaxTok && rToks.length <= MaxTok, s"doc $id over budget")
    }
  }

  test("plain-Scala replay: shared cut sized by the longer branch, responses trim their own") {
    out.foreach { case (id, npk, dp, ct, _, rt, _, dc, dr) =>
      val ws = norm(texts(id))
      val pw = ws.take(ws.length / 3)
      val cw = ws.drop(ws.length / 3)
      val rw = cw.reverse
      val oc = math.max(pw.length + cw.length + 3 - MaxTok, 0)
      val or = math.max(pw.length + rw.length + 3 - MaxTok, 0)
      val edp = math.min(math.max(oc, or), pw.length)
      assert((npk, dp) === ((pw.length - edp, edp)), s"doc $id prompt cut")
      assert((dc, dr) === ((math.max(oc - edp, 0), math.max(or - edp, 0))), s"doc $id trims")
      val expC = (Seq("<|user|>") ++ pw.drop(edp) ++ Seq("<|assistant|>") ++
        cw.dropRight(math.max(oc - edp, 0)) ++ Seq("<|end|>")).mkString(" ")
      val expR = (Seq("<|user|>") ++ pw.drop(edp) ++ Seq("<|assistant|>") ++
        rw.dropRight(math.max(or - edp, 0)) ++ Seq("<|end|>")).mkString(" ")
      assert(ct === expC && rt === expR, s"doc $id templates")
    }
  }

  test("asymmetric branches: the prompt pays for the LONGER one; the shorter response keeps everything") {
    import spark.implicits._
    // prompt 10, chosen 60 (over by 9), rejected 2 (under): dp = 9,
    // chosen trims 0 further, rejected trims 0 and keeps its 2 words
    val p = (1 to 10).map(i => s"p$i").mkString(" ")
    val c = (1 to 60).map(i => s"c$i").mkString(" ")
    val df = Seq((1L, p, c, "ra rb")).toDF("id", "p", "c", "r")
    val row = TextAnalysis.dpoPairs(df, "id", "p", "c", "r", MaxTok).head()
    assert(row.getInt(2) === 9, "drop_prompt must be the longer branch's overflow")
    assert(row.getInt(7) === 0 && row.getInt(8) === 0)
    val rToks = row.getString(5).split(" ", -1)
    assert(rToks.length === 1 + 1 + 1 + 2 + 1, "rejected keeps its full response")
    assert(rToks(1) === "p10", "both branches carry the same (right-kept) prompt tail")
    val cToks = row.getString(3).split(" ", -1)
    assert(cToks.length === MaxTok, "chosen lands exactly on budget")
    // response exhausts the budget only after the prompt is gone
    val df2 = Seq((2L, "p1 p2", (1 to 80).map(i => s"c$i").mkString(" "), "x")).toDF("id", "p", "c", "r")
    val row2 = TextAnalysis.dpoPairs(df2, "id", "p", "c", "r", MaxTok).head()
    assert(row2.getInt(2) === 2 && row2.getInt(7) === (2 + 80 + 3 - MaxTok) - 2)
  }

  test("NULL sides read as zero tokens and never poison the pair") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String], "good words", null.asInstanceOf[String]))
      .toDF("id", "p", "c", "r")
    val row = TextAnalysis.dpoPairs(df, "id", "p", "c", "r", 16).head()
    assert(row.getString(3) === "<|user|> <|assistant|> good words <|end|>")
    assert(row.getString(5) === "<|user|> <|assistant|> <|end|>")
    assert(row.getString(6) === "00" + "1")
  }
}
