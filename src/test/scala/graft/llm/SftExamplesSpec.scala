package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[TextAnalysis.sftExamples]] — instruction-tuning data prep.
  * Replays the truncation plan, template splice and loss mask in plain
  * Scala, and pins the SUPERVISION properties: the mask-1 region IS the
  * response (plus the end tag), prompt tokens never carry loss, and
  * truncation sacrifices prompt before response. */
class SftExamplesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val MaxTok = 64

  private def norm(s: String): Array[String] =
    s.toLowerCase.replaceAll("[.,;:!?]", "").replaceAll(" +", " ").trim
      .split(" ", -1).filter(_.nonEmpty)

  private lazy val out = {
    val paired = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"),
        filter(split(TextAnalysis.normalizeText(col("text")), " "),
          w => length(w) > 0).as("w"))
      .select(col("doc_id"),
        array_join(slice(col("w"), lit(1), expr("size(w) DIV 3")), " ").as("prompt"),
        array_join(slice(col("w"), expr("size(w) DIV 3 + 1"),
          expr("size(w) - size(w) DIV 3")), " ").as("response"))
    TextAnalysis.sftExamples(paired, "doc_id", "prompt", "response", MaxTok)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getInt(5), r.getString(6), r.getString(7)))
  }
  private lazy val texts = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
    .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("truncation plan, splice and mask replay in plain Scala") {
    out.foreach { case (id, npk, nrk, ntok, dp, dr, text, mask) =>
      val ws = norm(texts(id))
      val pw = ws.take(ws.length / 3)
      val rw = ws.drop(ws.length / 3)
      val over = math.max(pw.length + rw.length + 3 - MaxTok, 0)
      val edp = math.min(over, pw.length)
      val edr = over - edp
      assert((dp, dr) === ((edp, edr)), s"doc $id truncation plan")
      assert(npk === pw.length - edp && nrk === rw.length - edr, s"doc $id kept counts")
      assert(ntok === npk + nrk + 3, s"doc $id n_tokens")
      val expText = (Seq("<|user|>") ++ pw.drop(edp) ++ Seq("<|assistant|>") ++
        rw.dropRight(edr) ++ Seq("<|end|>")).mkString(" ")
      assert(text === expText, s"doc $id template")
      assert(mask === "0" * (npk + 2) + "1" * (nrk + 1), s"doc $id mask")
    }
  }

  test("lossMaskArray: the loader-side array<int> equals the per-char split of the string witness") {
    // the string mask stays the oracle witness; the array is one
    // codegen'd expression at the export projection — this pins the
    // conversion on BOTH preps' real outputs (SFT + DPO masks)
    val sft = graft.queries.LlmQueries.sftExamplesQ(spark, TestSpark.sfDir)
      .select(col("loss_mask"),
        TextAnalysis.lossMaskArray(col("loss_mask")).as("mask_array"))
      .collect()
    assert(sft.nonEmpty)
    sft.foreach { r =>
      val s = r.getString(0)
      val a = r.getSeq[Int](1)
      assert(a === s.map(_.asDigit).toSeq, s"sft mask '$s'")
      assert(a.forall(v => v == 0 || v == 1))
    }
    val dpo = graft.queries.LlmQueries.dpoPairsQ(spark, TestSpark.sfDir)
      .select(col("chosen_mask"),
        TextAnalysis.lossMaskArray(col("chosen_mask")).as("ca"),
        col("rejected_mask"),
        TextAnalysis.lossMaskArray(col("rejected_mask")).as("ra"))
      .collect()
    dpo.foreach { r =>
      assert(r.getSeq[Int](1) === r.getString(0).map(_.asDigit).toSeq)
      assert(r.getSeq[Int](3) === r.getString(2).map(_.asDigit).toSeq)
    }
  }

  test("supervision invariants: mask aligns with tokens, loss covers exactly response + end tag") {
    out.foreach { case (id, npk, nrk, ntok, _, _, text, mask) =>
      val toks = text.split(" ", -1)
      assert(toks.length === ntok && mask.length === ntok, s"doc $id mask misaligned")
      assert(ntok <= MaxTok, s"doc $id over budget")
      // zero-loss region: user tag + kept prompt + assistant tag
      assert(toks(0) === "<|user|>" && mask(0) === '0')
      assert(toks(npk + 1) === "<|assistant|>" && mask(npk + 1) === '0')
      // loss region: kept response then the end tag, all 1s
      assert(toks.last === "<|end|>" && mask.last === '1')
      (npk + 2 until ntok).foreach(i => assert(mask(i) === '1', s"doc $id slot $i"))
    }
  }

  test("truncation sacrifices prompt before response; untruncated rows splice losslessly") {
    out.foreach { case (id, _, nrk, _, dp, dr, text, mask) =>
      if (dr > 0) {
        val ws = norm(texts(id))
        assert(dp === ws.length / 3, s"doc $id response paid before prompt exhausted")
      }
      if (dp == 0 && dr == 0) {
        val ws = norm(texts(id))
        val toks = text.split(" ", -1)
        val response = toks.zip(mask).collect { case (t, '1') => t }.dropRight(1)
        assert(response.toSeq === ws.drop(ws.length / 3).toSeq, s"doc $id lossless response")
        val prompt = toks.zip(mask).collect { case (t, '0') => t }
          .drop(1).dropRight(1)
        assert(prompt.toSeq === ws.take(ws.length / 3).toSeq, s"doc $id lossless prompt")
        assert(nrk === response.length)
      }
    }
    assert(out.exists(_._5 > 0) && out.exists(r => r._5 == 0 && r._6 == 0),
      "fixture must exercise both the truncated and untruncated regimes")
  }

  test("NULL / empty prompt and response read as zero tokens, never drop or poison the row") {
    import spark.implicits._
    val df = Seq(
      (1L, null.asInstanceOf[String], "fine answer words"),
      (2L, "ask me", null.asInstanceOf[String]),
      (3L, "", "")).toDF("id", "p", "r")
    val got = TextAnalysis.sftExamples(df, "id", "p", "r", 16)
      .orderBy("id").collect()
    assert(got.length === 3)
    assert(got(0).getString(6) === "<|user|> <|assistant|> fine answer words <|end|>")
    assert(got(0).getString(7) === "00" + "1" * 4)
    assert(got(1).getString(6) === "<|user|> ask me <|assistant|> <|end|>")
    assert(got(1).getString(7) === "0000" + "1")
    assert(got(2).getString(6) === "<|user|> <|assistant|> <|end|>")
    assert(got(2).getInt(3) === 3)
  }

  test("sft_packed_layout: every example placed exactly once; supervised never exceeds used") {
    val bins = graft.queries.LlmQueries.sftPackedLayout(spark, TestSpark.sfDir).collect()
    assert(bins.nonEmpty)
    val placed = bins.flatMap(_.getString(7).split(",")).map(_.toLong)
    assert(placed.length === placed.distinct.length, "an example appears in two windows")
    assert(placed.length === out.length, "an example was dropped by the packer")
    bins.foreach { r =>
      val used = r.getLong(3); val pad = r.getLong(4); val sup = r.getLong(5)
      assert(used + pad >= 256L, s"bin ${r.getLong(1)} accounting")
      assert(sup <= used, s"bin ${r.getLong(1)} supervised > used")
      assert(r.getLong(6) === sup * 1000000L / used, s"bin ${r.getLong(1)} ppm")
    }
  }

  test("plan: each token pipeline evaluates once — CollapseProject must not clone the regexes") {
    // a parquet source (not a LocalTableScan, which constant-folds the
    // whole projection away) with genuinely distinct prompt/response cols
    val df = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text").as("p"), col("source").as("r"))
    val plan = TextAnalysis.sftExamples(df, "doc_id", "p", "r", 16)
      .queryExecution.executedPlan.toString
    val n = "regexp_replace".r.findAllIn(plan).size
    // normalizeText is two regexp_replace calls; two pipelines (prompt,
    // response) = exactly 4 occurrences in the whole physical plan
    assert(n === 4, s"expected 4 regexp_replace (2 pipelines x 2), got $n:\n$plan")
  }
}
