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

  test("dpo_packed_layout: pair-affinity FFD replayed — units are max branch length, every pair placed once") {
    val bins = graft.queries.LlmQueries.dpoPackedLayout(spark, TestSpark.sfDir).collect()
    assert(bins.nonEmpty)
    // plain-Scala replay of the whole layout: derivation -> shared-cut
    // truncation -> pair units -> per-shard FFD at W=256 -> rollup
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def shard(id: Long): Int = (java.lang.Long.parseLong(md5hex(id.toString).take(15), 16) % 8).toInt
    val units = texts.toSeq.filter(_._2 != null).map { case (id, text) =>
      val ws = norm(text)
      val pw = ws.take(ws.length / 3)
      val cw = ws.drop(ws.length / 3)
      val rw = cw.reverse.take(cw.length / 2)
      val oc = math.max(pw.length + cw.length + 3 - MaxTok, 0)
      val or = math.max(pw.length + rw.length + 3 - MaxTok, 0)
      val dp = math.min(math.max(oc, or), pw.length)
      val ntc = pw.length - dp + (cw.length - math.max(oc - dp, 0)) + 3L
      val ntr = pw.length - dp + (rw.length - math.max(or - dp, 0)) + 3L
      (id, ntc, ntr, math.max(ntc, ntr))
    }
    val expected = units.groupBy(u => shard(u._1)).flatMap { case (sh, ms) =>
      val ordered = ms.sortBy(u => (-u._4, u._1))
      val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
      val placed = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long, Int)] // id, ntc, ntr, unit, bin
      ordered.foreach { case (id, ntc, ntr, u) =>
        val fit = rem.indexWhere(_ >= u)
        val bin = if (fit >= 0) { rem(fit) -= u; fit }
          else { rem += (256L - u); rem.length - 1 }
        placed += ((id, ntc, ntr, u, bin))
      }
      placed.groupBy(_._5).map { case (bin, ps) =>
        ((sh, bin.toLong), (ps.length.toLong, ps.map(_._4).sum, ps.map(_._2).sum,
          ps.map(_._3).sum, ps.map(_._1).mkString(",")))
      }
    }
    assert(bins.length === expected.size)
    bins.foreach { r =>
      val key = (r.getInt(0), r.getLong(1))
      val (np, used, ct, rt, ids) = expected(key)
      assert((r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6), r.getString(9)) ===
        ((np, used, ct, rt, ids)), s"bin $key")
      assert(r.getLong(3) <= 256 && r.getLong(4) === 256 - r.getLong(3), s"bin $key budget")
      // the two-view contract: each view's tokens fit inside the units
      assert(r.getLong(5) <= r.getLong(3) && r.getLong(6) <= r.getLong(3), s"bin $key views")
    }
    // every pair placed exactly once across the whole layout
    val placedIds = bins.flatMap(_.getString(9).split(",")).map(_.toLong)
    assert(placedIds.length === placedIds.distinct.length)
    assert(placedIds.toSet === units.map(_._1).toSet)
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
