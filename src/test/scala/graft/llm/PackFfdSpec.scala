package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[TextAnalysis.packSequencesFfd]] — whole-doc first-fit-decreasing
  * packing. Pins the invariants (no torn docs by construction; no bin
  * over capacity except a singleton oversized doc; every doc placed
  * exactly once), the determinism, and MEASURES the pad-ratio trade
  * against first-fit in arrival order (the whole-doc baseline) and the
  * capacity lower bound — the numbers recorded in SCALE.md. */
class PackFfdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = 2048

  private def ffReplay(lens: Seq[Long], w: Long): Int = {
    val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
    lens.foreach { n =>
      val fit = bins.indexWhere(_ >= n)
      if (fit >= 0) bins(fit) -= n else bins += (w - n)
    }
    bins.length
  }

  test("every doc placed once; no bin over capacity; deterministic") {
    val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
    val out = TextAnalysis.packSequencesFfd(docs, "doc_id",
      TextAnalysis.tokenCountWs(col("text")).cast("long"), W).collect()
    val nDocs = docs.count()
    assert(out.length == nDocs, "every doc packed exactly once")
    val fills = out.groupBy(_.getLong(2)).map { case (b, rs) => b -> rs.map(_.getLong(1)).sum }
    fills.foreach { case (b, fill) =>
      assert(fill <= W || out.count(_.getLong(2) == b) == 1,
        s"bin $b over capacity ($fill) without being an oversized singleton")
    }
    val again = TextAnalysis.packSequencesFfd(docs, "doc_id",
      TextAnalysis.tokenCountWs(col("text")).cast("long"), W).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(2))).toSeq)
  }

  test("an oversized doc opens its own bin and the bin takes nothing else") {
    val df = Seq((1L, 3000L), (2L, 1000L), (3L, 1000L), (4L, 48L))
      .toDF("doc_id", "n")
    val out = TextAnalysis.packSequencesFfd(df, "doc_id", col("n"), W)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // decreasing order: 3000 (bin 0, overflows), 1000+1000+48 share bin 1
    assert(out(1L) == 0L)
    assert(out(2L) == 1L && out(3L) == 1L && out(4L) == 1L)
  }

  test("pad ratio: FFD beats arrival-order first-fit and approaches the capacity bound") {
    val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
    val lens = docs.select(TextAnalysis.tokenCountWs(col("text")).cast("long"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = lens.map(_._1).sum
    val lower = math.ceil(total.toDouble / W).toInt
    val ffdBins = TextAnalysis.packSequencesFfd(docs, "doc_id",
      TextAnalysis.tokenCountWs(col("text")).cast("long"), W)
      .agg(countDistinct("bin_id")).head.getLong(0).toInt
    val arrivalBins = ffReplay(lens.sortBy(_._2).map(_._1).toSeq, W)
    def padRatio(b: Int) = (b.toLong * W - total).toDouble / (b.toLong * W)
    info(f"total=$total tokens, capacity lower bound=$lower bins; " +
      f"FFD=$ffdBins bins (pad ${padRatio(ffdBins) * 100}%.2f%%), " +
      f"arrival-order FF=$arrivalBins bins (pad ${padRatio(arrivalBins) * 100}%.2f%%)")
    assert(ffdBins <= arrivalBins, "decreasing order must never pack worse than arrival order")
    // FFD's classic guarantee, loosened for the tiny fixture
    assert(ffdBins <= math.ceil(11.0 * lower / 9.0) + 1, "FFD within its approximation bound")
    // a tight window makes the ordering trade visible (W=2048 swallows
    // the whole fixture near the bound): decreasing order must beat
    // arrival order outright
    val wTight = 128
    val ffdTight = TextAnalysis.packSequencesFfd(docs, "doc_id",
      TextAnalysis.tokenCountWs(col("text")).cast("long"), wTight)
      .agg(countDistinct("bin_id")).head.getLong(0).toInt
    val arrivalTight = ffReplay(lens.sortBy(_._2).map(_._1).toSeq, wTight)
    def padT(b: Int) = (b.toLong * wTight - total).toDouble / (b.toLong * wTight)
    info(f"W=$wTight: FFD=$ffdTight bins (pad ${padT(ffdTight) * 100}%.2f%%) vs " +
      f"arrival FF=$arrivalTight (pad ${padT(arrivalTight) * 100}%.2f%%)")
    assert(ffdTight < arrivalTight,
      s"at W=$wTight decreasing order must strictly beat arrival order " +
        s"($ffdTight vs $arrivalTight)")
  }
  test("sharded FFD == per-shard global FFD; shard overhead bounded by shard count") {
    val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
    val nTok = TextAnalysis.tokenCountWs(col("text")).cast("long")
    val sharded = TextAnalysis.packSequencesFfdSharded(docs, "doc_id", nTok, W, nShards = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    // per shard, the assignment equals running the UNSHARDED operator
    // on just that shard's docs (composition: shard then pack)
    sharded.groupBy(_._1).foreach { case (shard, rows) =>
      val ids = rows.map(_._2).toSet
      val solo = TextAnalysis.packSequencesFfd(
          docs.filter(graft.llm.Sampling.shardAssign(col("doc_id"), 8) === shard),
          "doc_id", nTok, W)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      rows.foreach { case (_, id, bin) =>
        assert(solo(id) == bin, s"shard $shard doc $id: sharded=$bin solo=${solo(id)}")
      }
      assert(solo.keySet == ids)
    }
    // every doc packed exactly once across shards
    assert(sharded.map(_._2).distinct.length == docs.count())
    // shard overhead: at most nShards extra partial bins vs global FFD
    val globalBins = TextAnalysis.packSequencesFfd(docs, "doc_id", nTok, W)
      .agg(countDistinct("bin_id")).head.getLong(0)
    val shardedBins = sharded.map(r => (r._1, r._3)).distinct.length
    assert(shardedBins <= globalBins + 8,
      s"sharded bins $shardedBins vs global $globalBins + 8 shards")
  }

  test("compaction_plan: FFD over the manifest replays; groups respect the target") {
    val out = graft.queries.LlmQueries.compactionPlan(spark, graft.TestSpark.sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    // every shard planned exactly once
    assert(out.map(_._1).distinct.length === out.length)
    // group rollup is consistent and within the 12000-byte target
    out.groupBy(_._3).foreach { case (g, rows) =>
      val bytes = rows.map(_._2).sum
      assert(rows.forall(r => r._4 == bytes && r._5 == rows.length), s"group $g rollup")
      assert(bytes <= 12000 || rows.length == 1,
        s"group $g at $bytes bytes must be one oversized shard or within target")
    }
    // the plan IS first-fit-decreasing: replay in plain Scala
    val sizes = out.map(r => (r._1, r._2)).sortBy { case (id, b) => (-b, id) }
    val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
    val want = sizes.map { case (id, b) =>
      val fit = bins.indexWhere(_ >= b)
      if (fit >= 0) { bins(fit) -= b; (id, fit.toLong) }
      else { bins += (12000L - b); (id, (bins.length - 1).toLong) }
    }.toMap
    out.foreach { case (id, _, g, _, _) => assert(want(id) === g, s"shard $id") }
  }

  test("compaction_plan_sharded: per-source FFD replays; groups never cross sources") {
    val out = graft.queries.LlmQueries.compactionPlanSharded(spark, graft.TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
    assert(out.nonEmpty)
    // every (source, shard) planned exactly once
    assert(out.map(r => (r._1, r._2)).distinct.length === out.length)
    out.groupBy(_._1).foreach { case (src, rows) =>
      // rollup consistent and within the 2000-byte target per group
      rows.groupBy(_._4).foreach { case (g, grp) =>
        val bytes = grp.map(_._3).sum
        assert(grp.forall(r => r._5 == bytes && r._6 == grp.length), s"$src group $g rollup")
        assert(bytes <= 2000 || grp.length == 1,
          s"$src group $g at $bytes bytes must be one oversized file or within target")
      }
      // the per-source trajectory IS first-fit-decreasing, independent
      // of every other source's state
      val sizes = rows.map(r => (r._2, r._3)).sortBy { case (id, b) => (-b, id) }
      val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
      val want = sizes.map { case (id, b) =>
        val fit = bins.indexWhere(_ >= b)
        if (fit >= 0) { bins(fit) -= b; (id, fit.toLong) }
        else { bins += (2000L - b); (id, (bins.length - 1).toLong) }
      }.toMap
      rows.foreach { case (_, id, _, g, _, _) => assert(want(id) === g, s"$src shard $id") }
    }
  }
}
