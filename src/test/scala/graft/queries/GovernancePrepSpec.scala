package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-19 governance / post-training prep gates: plain-Scala replays
  * of reward-model pair extraction (rm_pairs_from_n), the snapshot diff
  * (dataset_diff), delete-request propagation through the packed-window
  * artifact (forget_docs_audit), and the deterministic resumable epoch
  * ordering (epoch_order_resume). */
class GovernancePrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private def norm(s: String): Array[String] =
    s.toLowerCase.replaceAll("[.,;:!?]", "").replaceAll(" +", " ").trim
      .split(" ", -1).filter(_.nonEmpty)

  private def reward(c: Seq[String]): Long =
    c.zipWithIndex.map { case (w, i) => h60(s"rm:$w:${i + 1}") % 1000 }.sum

  private def cands(text: String): Seq[(Int, Long, Seq[String])] = {
    val ws = norm(text)
    val rw = ws.drop(ws.length / 3).toSeq
    (0 until 4).map { j =>
      val jm = if (rw.isEmpty) 0 else j % rw.length
      val c = rw.drop(jm) ++ rw.take(jm)
      (j, reward(c), c)
    }
  }

  private lazy val texts: Map[Long, String] =
    Tables(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text").collect()
      .filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getString(1)).toMap

  test("rm_pairs_from_n: (best, worst) with opposite tie-breaks, margin-0 pairs dropped") {
    val got = LlmQueries.rmPairsFromN(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getString(6), r.getString(7)))).toMap
    var expected = 0
    texts.foreach { case (id, text) =>
      val cs = cands(text)
      val (bj, br, bc) = cs.minBy { case (j, r, _) => (-r, j) }
      val (wj, wr, wc) = cs.minBy { case (j, r, _) => (r, -j) }
      if (br - wr > 0) {
        expected += 1
        val (gbj, gwj, gbr, gwr, gm, gbmd5, gwmd5) = got(id)
        assert((gbj, gwj, gbr, gwr, gm) === ((bj, wj, br, wr, br - wr)), s"doc $id pair")
        assert(gbmd5 === md5hex(bc.mkString(" ")) && gwmd5 === md5hex(wc.mkString(" ")),
          s"doc $id pair texts")
      } else assert(!got.contains(id), s"doc $id margin-0 pair must be dropped")
    }
    assert(got.size === expected)
  }

  test("rm_pairs_from_n: shares the selection contract with best_of_n_select") {
    val best = LlmQueries.bestOfNSelect(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    LlmQueries.rmPairsFromN(spark, TestSpark.sfDir).collect().foreach { r =>
      assert(best(r.getLong(0)) === ((r.getInt(1), r.getLong(3))),
        s"doc ${r.getLong(0)}: pair extraction must pick the same best candidate")
    }
  }

  test("rm_pairs_from_n: a fully-tied candidate field (1-word response) emits no pair") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("rmp").toString
    Seq((1L, "aa")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    assert(LlmQueries.rmPairsFromN(spark, tmp).count() === 0L)
  }

  test("dataset_diff: statuses replay from the md5 bucket and all four are populated") {
    val got = LlmQueries.datasetDiff(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val exp = texts.keys.map { id =>
      id -> ((h60(s"snap:$id") % 4) match {
        case 3 => "added"
        case 0 => "removed"
        case 2 => "changed" // the simulated ' [v2]' edit always changes the hash
        case _ => "unchanged"
      })
    }.toMap
    assert(got === exp)
    assert(got.values.toSet === Set("added", "removed", "changed", "unchanged"))
  }

  test("forget_docs_audit: exactly the hash-selected docs, each in one bin, tokens accounted") {
    val rows = LlmQueries.forgetDocsAudit(spark, TestSpark.sfDir).collect()
    val forgetIds = texts.keys.filter(id => h60(s"forget:$id") % 200 == 0).toSet
    assert(forgetIds.nonEmpty, "fixture must plant at least one delete request")
    val emitted = rows.flatMap(_.getString(5).split(",")).map(_.toLong)
    assert(emitted.toSet === forgetIds, "every delete request lands in exactly the audit")
    assert(emitted.length === forgetIds.size, "a forget doc must appear in ONE bin")
    rows.foreach { r =>
      assert(r.getLong(3) === r.getString(5).split(",").length.toLong,
        s"bin ${r.getInt(0)}/${r.getLong(1)}: n_forget vs ids")
      assert(r.getLong(3) <= r.getLong(2), "forget members bounded by bin membership")
    }
    val gotTokens = rows.map(_.getLong(4)).sum
    val expTokens = forgetIds.toSeq.map(id => texts(id).split(" +").length.toLong).sum
    assert(gotTokens === expTokens, "forget_tokens must sum the members' token counts")
  }

  test("stream_dataset_diff equals the batch diff minus its removed rows") {
    val batch = LlmQueries.datasetDiff(spark, TestSpark.sfDir).collect()
      .filter(_.getString(1) != "removed")
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    val stream = StreamingQueries.streamDatasetDiff(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(stream === batch,
      "ingest-side diff must replay the batch diff for every arriving doc")
    assert(stream.values.map(_._1).toSet === Set("added", "changed", "unchanged"))
  }

  test("stream_dataset_diff UNION dataset_diff_close reconstructs the batch diff exactly") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), Option(r.getString(2)), Option(r.getString(3)))))
    val full = rows(LlmQueries.datasetDiff(spark, TestSpark.sfDir)).toMap
    val parts = (rows(StreamingQueries.streamDatasetDiff(spark, TestSpark.sfDir)) ++
      rows(StreamingQueries.datasetDiffClose(spark, TestSpark.sfDir))).toMap
    assert(parts === full,
      "the stream plus its snapshot-cut close must equal the batch diff row for row")
  }

  test("dataset_diff_chunks: bounded ripple — a tail edit never touches an interior chunk") {
    val rows = LlmQueries.datasetDiffChunks(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val changed = texts.keys.count(id => h60(s"snap:$id") % 4 == 2)
    assert(rows.length === changed, "every changed doc gets a chunk-diff row")
    rows.foreach { case (id, a, b, added, removed, kept, ppm) =>
      assert(removed <= 1, s"doc $id: a tail append may invalidate at most the tail chunk")
      assert(kept >= a - 1, s"doc $id: interior chunks must survive the edit")
      assert(a === removed + kept && b === added + kept, s"doc $id: set arithmetic")
      assert(ppm === kept * 1000000L / b, s"doc $id: reuse_ppm")
      assert(added >= 1, s"doc $id: the [v2] tail must produce at least one new chunk")
    }
    // the operator's point: most chunk embeddings are reusable
    val totKept = rows.map(_._6).sum.toDouble
    val totB = rows.map(_._3).sum.toDouble
    assert(totKept / totB > 0.5, f"aggregate reuse ${totKept / totB}%.2f should dominate")
  }

  test("dataset_diff_chunks plan: one narrow map — no shuffle before the final sort") {
    val plan = LlmQueries.datasetDiffChunks(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"chunk diff must be row-local:\n$plan")
    assert(!plan.contains("Generate"), s"no explode — set ops run in-row:\n$plan")
  }

  test("forget_rebuild_plan: plain-Scala FFD replay over exactly the audited bins' survivors") {
    val audited = LlmQueries.forgetDocsAudit(spark, TestSpark.sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getString(5).split(",").map(_.toLong).toSet)
      .toMap
    val lay = graft.llm.TextAnalysis.packedWindowLayout(
        Tables(spark, TestSpark.sfDir, "documents")
          .withColumn("shard_id", graft.llm.Sampling.shardAssign(
            org.apache.spark.sql.functions.col("doc_id"), 8)),
        Seq("shard_id"), "doc_id",
        graft.llm.TextAnalysis.tokenCountWs(
          org.apache.spark.sql.functions.col("text")).cast("long"), 2048)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // survivors = members of audited bins minus the forgotten ids
    val forgotten = audited.values.flatten.toSet
    val survivors = lay
      .filter { case (sh, _, _, bin) => audited.contains((sh, bin)) }
      .filter { case (_, id, _, _) => !forgotten.contains(id) }
      .map { case (sh, id, n, _) => (sh, id, n) }
    // first-fit-decreasing per shard, (n DESC, doc_id ASC)
    val expected = survivors.groupBy(_._1).map { case (sh, ms) =>
      val ordered = ms.sortBy { case (_, id, n) => (-n, id) }
      val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, scala.collection.mutable.ArrayBuffer[(Long, Long)])]
      ordered.foreach { case (_, id, n) =>
        bins.indexWhere(_._1 >= n) match {
          case -1 => bins += ((2048L - n, scala.collection.mutable.ArrayBuffer((id, n))))
          case i  => val (rem, m) = bins(i); m += ((id, n)); bins(i) = (rem - n, m)
        }
      }
      sh -> bins.zipWithIndex.map { case ((_, m), b) =>
        (b.toLong, m.map(_._1).mkString(","),
          m.scanLeft(0L)(_ + _._2).init.mkString(","))
      }.toSeq
    }
    val got = LlmQueries.forgetRebuildPlan(spark, TestSpark.sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getString(5), r.getString(6)))).toMap
    val expFlat = expected.flatMap { case (sh, bs) =>
      bs.map { case (b, ids, offs) => (sh, b) -> ((ids, offs)) } }.toMap
    assert(got === expFlat)
    assert(got.nonEmpty, "fixture must contaminate at least one bin")
    got.values.foreach { case (ids, _) =>
      ids.split(",").map(_.toLong).foreach(id =>
        assert(!forgotten.contains(id), s"forgotten doc $id repacked"))
    }
  }

  test("forget_pipeline_report: every surface's numbers equal its gate's aggregates") {
    val rep = LlmQueries.forgetPipelineReport(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rep.size === 17)
    val audit = LlmQueries.forgetDocsAudit(spark, TestSpark.sfDir).collect()
    assert(rep(("packed_windows", "contaminated_bins")) === audit.length.toLong)
    assert(rep(("packed_windows", "forgotten_docs")) === audit.map(_.getLong(3)).sum)
    assert(rep(("packed_windows", "forgotten_tokens")) === audit.map(_.getLong(4)).sum)
    val rebuild = LlmQueries.forgetRebuildPlan(spark, TestSpark.sfDir).collect()
    assert(rep(("rebuild", "surviving_docs")) === rebuild.map(_.getLong(2)).sum)
    assert(rep(("rebuild", "surviving_tokens")) === rebuild.map(_.getLong(3)).sum)
    val dels50 = Tables(spark, TestSpark.sfDir, "embeddings")
      .select("vec_id").collect().map(_.getLong(0))
      .count(id => h60(s"forget:$id") % 50 == 0)
    assert(rep(("ann_index", "masked_vectors")) === dels50.toLong)
    assert(rep(("bm25_index", "masked_postings")) >= rep(("bm25_index", "masked_docs")))
    assert(rep(("bm25_index", "masked_tf")) >= rep(("bm25_index", "masked_postings")))
    // the two media band indexes: masked members = the %50 doc list,
    // band rows = the indexes' exact fan-out (4 dHash bands; 8×4
    // composite bands) — read from the PERSISTED tables
    // ALL doc ids — the media indexes cover NULL-text docs too
    val docs50 = Tables(spark, TestSpark.sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
      .count(id => h60(s"forget:$id") % 50 == 0).toLong
    assert(rep(("media_index", "masked_images")) === docs50)
    assert(rep(("media_index", "masked_band_rows")) === 4L * docs50)
    assert(rep(("caption_index", "masked_pairs")) === docs50)
    assert(rep(("caption_index", "masked_band_rows")) === 32L * docs50)
    assert(rep(("audio_index", "masked_clips")) === docs50)
    assert(rep(("audio_index", "masked_band_rows")) === 4L * docs50)
    assert(rep(("video_index", "masked_videos")) === docs50)
    assert(rep(("video_index", "masked_band_rows")) === 4L * docs50)
  }

  test("rm_pairs_to_dpo: packs exactly rm_pairs_from_n's pairs, chosen branch = the selected winner") {
    val rmDocs = LlmQueries.rmPairsFromN(spark, TestSpark.sfDir).collect()
      .map(_.getLong(0)).toSet
    val bins = LlmQueries.rmPairsToDpo(spark, TestSpark.sfDir).collect()
    val packed = bins.flatMap(_.getString(9).split(",")).map(_.toLong)
    assert(packed.toSet === rmDocs,
      "the packer must receive exactly the margin-positive pairs")
    assert(packed.length === rmDocs.size, "each pair packs exactly once")
    assert(bins.map(_.getLong(2)).sum === rmDocs.size.toLong)
    bins.foreach { r =>
      // candidates are same-length rotations: the two views tie here
      assert(r.getLong(5) === r.getLong(6),
        s"bin ${r.getInt(0)}/${r.getLong(1)}: rotation pairs must have equal view totals")
      // every pair unit is ≤ ~67 tokens (maxTokens 64 + tags), so no
      // bin can overflow the 256 window: used + pad must tile it
      assert(r.getLong(3) + r.getLong(4) === 256L,
        s"bin ${r.getInt(0)}/${r.getLong(1)}: used_units + pad_tokens must equal the window")
    }
  }

  test("rm_pairs_to_dpo plan: no join anywhere — the reward pipeline evaluates once, nothing joins back") {
    val plan = LlmQueries.rmPairsToDpo(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"the composition must be join-free:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size === 1,
      s"exactly one corpus scan expected:\n$plan")
    assert(plan.contains("Generate"),
      s"the inline single-eval barrier must survive optimization:\n$plan")
  }

  test("forget_vocab_audit: a piece whose sole support is a forgotten doc reads lost") {
    import spark.implicits._
    // the first doc id on the %200 delete list — the same predicate the
    // gate masks, evaluated with the same portable hash
    val fid = (0L to 100000L).find(id => h60(s"forget:$id") % 200 == 0).get
    val keepIds = (0L to 100000L).filter(id => h60(s"forget:$id") % 200 != 0).take(3)
    val tmp = java.nio.file.Files.createTempDirectory("fva").toString
    // the planted doc is the ONLY source of the letter z (and of every
    // z-piece a trainer derives from it); the survivor docs are
    // delete-independent, and the corpus stays far under the top-V
    // word cap so masking frees no vocabulary slots
    (Seq((fid, "zaza zaza zaza zaza zaza zaza")) ++
      keepIds.map(id => (id, "the cat sat on the mat the cat sat")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = LlmQueries.forgetVocabAudit(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    val zPieces = rows.keys.filter(_._2.contains("z"))
    assert(zPieces.nonEmpty, "the planted word must reach both vocabularies")
    assert(Seq("bpe", "unigram").forall(t => zPieces.exists(_._1 == t)),
      s"both tokenizers must carry a z-piece: $zPieces")
    zPieces.foreach(k => assert(rows(k) === "lost",
      s"$k is supported only by the forgotten doc and must read lost"))
    (rows.keySet -- zPieces).foreach(k => assert(rows(k) === "kept",
      s"$k is delete-independent and must read kept"))
  }

  test("epoch_order_resume: full plain-Scala replay; epochs permute independently") {
    val got = LlmQueries.epochOrderResume(spark, TestSpark.sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val ids = Tables(spark, TestSpark.sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val exp = (for { e <- Seq(0, 1); id <- ids } yield {
      val k = md5hex(s"epoch$e:$id")
      (e, (java.lang.Long.parseLong(k.take(15), 16) % 8).toInt, k, id)
    }).groupBy { case (e, sh, _, _) => (e, sh) }.map { case (key, members) =>
      val ordered = members.sortBy { case (_, _, k, id) => (k, id) }
      val n = ordered.size.toLong
      val half = n / 2
      val P = 1000003L
      val sigs = ordered.zipWithIndex.map { case ((_, _, _, id), i) =>
        val pos = i + 1L
        val h = h60(id.toString) % P
        (pos * h % P, if (pos > half) (pos - half) * h % P else 0L)
      }
      key -> ((n, ordered.head._4, ordered.last._4,
        sigs.map(_._1).sum % P, sigs.map(_._2).sum % P))
    }
    assert(got === exp)
    // epoch freshness: the two epochs must not replay the same permutation
    assert((0 until 8).exists(sh => got((0, sh))._4 != got.get((1, sh)).map(_._4).getOrElse(-1L)),
      "epoch 0 and epoch 1 order signatures must differ somewhere")
  }

  test("dataset_diff plan: hashes computed below the join exchanges (shuffle never carries text)") {
    val df = LlmQueries.datasetDiff(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"snapshot diff is a full-outer join:\n$plan")
    // each join input projects (doc_id, md5) BEFORE its exchange — the
    // exchange rows are 40 bytes, not documents; a plan that shuffles
    // `text` would show it in the hashpartitioning subtree's Project
    val joinInputs = plan.split("Exchange hashpartitioning").drop(1)
    assert(joinInputs.nonEmpty)
    joinInputs.foreach { seg =>
      val proj = seg.linesIterator.find(_.contains("Project")).getOrElse("")
      assert(proj.contains("md5"), s"join input must pre-hash:\n$seg")
    }
  }

  test("epoch_order_windows: plain-Scala replay over the shipped FFD layout; resume re-derives the window tail") {
    val P = 1000003L
    // the layout the packer ships — collected once, replayed in plain Scala
    val lay = graft.llm.TextAnalysis.packedWindowLayout(
        Tables(spark, TestSpark.sfDir, "documents")
          .withColumn("shard_id", graft.llm.Sampling.shardAssign(
            org.apache.spark.sql.functions.col("doc_id"), 8)),
        Seq("shard_id"), "doc_id",
        graft.llm.TextAnalysis.tokenCountWs(
          org.apache.spark.sql.functions.col("text")).cast("long"), 2048)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val wsig = lay.groupBy { case (sh, _, bin, _) => (sh, bin) }
      .view.mapValues(_.map { case (_, id, _, seq) =>
        (seq + 1) * (h60(id.toString) % P) % P }.sum % P).toMap
    val exp = (for { e <- Seq(0, 1); ((sh, bin), sig) <- wsig } yield {
      val k = md5hex(s"wepoch$e:$sh:$bin")
      (e, (java.lang.Long.parseLong(k.take(15), 16) % 8).toInt, k, sh, bin, 1L + sig)
    }).groupBy { case (e, rs, _, _, _, _) => (e, rs) }.map { case (key, ms) =>
      val ordered = ms.sortBy { case (_, _, k, sh, bin, _) => (k, sh, bin) }
      val n = ordered.size.toLong
      val half = n / 2
      val sigs = ordered.zipWithIndex.map { case ((_, _, _, _, _, h), i) =>
        val pos = i + 1L
        (pos * h % P, if (pos > half) (pos - half) * h % P else 0L)
      }
      def lbl(m: (Int, Int, String, Int, Long, Long)) = s"${m._4}:${m._5}"
      key -> ((n, lbl(ordered.head), lbl(ordered.last),
        sigs.map(_._1).sum % P, sigs.map(_._2).sum % P))
    }
    val got = LlmQueries.epochOrderWindows(spark, TestSpark.sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getString(3), r.getString(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got === exp)
    assert((0 until 8).exists(sh =>
      got.get((0, sh)).map(_._4) != got.get((1, sh)).map(_._4)),
      "the two epochs must not replay the same window permutation")
  }

  test("epoch_order_windows plan: three bounded hash exchanges, no union, no global sort") {
    val plan = LlmQueries.epochOrderWindows(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"epochs must come from one layout:\n$plan")
    val ex = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(ex === 3,
      s"expected layout shard + window rollup + (epoch, reader-shard) exchanges, got $ex:\n$plan")
    // the permutation rank is a per-(epoch, reader-shard) local sort,
    // never a single-partition global sort
    assert(!plan.contains("Exchange SinglePartition"), s"no global sort:\n$plan")
  }

  test("epoch_order_rebuilt: replay over clean g0 + rebuilt g1 windows; no forgotten doc enters any checksum") {
    val P = 1000003L
    val lay = graft.llm.TextAnalysis.packedWindowLayout(
        Tables(spark, TestSpark.sfDir, "documents")
          .withColumn("shard_id", graft.llm.Sampling.shardAssign(
            org.apache.spark.sql.functions.col("doc_id"), 8)),
        Seq("shard_id"), "doc_id",
        graft.llm.TextAnalysis.tokenCountWs(
          org.apache.spark.sql.functions.col("text")).cast("long"), 2048)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val allIds = lay.map(_._2).toSet
    val forgotten = allIds.filter(id => h60(s"forget:$id") % 200 == 0)
    val contaminated = lay.filter { case (_, id, _, _, _) => forgotten.contains(id) }
      .map { case (sh, _, _, bin, _) => (sh, bin) }.toSet
    // g0: clean bins keep their original placement
    val g0 = lay.filter { case (sh, _, _, bin, _) => !contaminated.contains((sh, bin)) }
      .map { case (sh, id, _, bin, seq) => (("g0", sh, bin), id, seq) }
    // g1: contaminated bins' survivors re-FFD per shard (the rebuild spec's replay)
    val survivors = lay
      .filter { case (sh, id, _, bin, _) =>
        contaminated.contains((sh, bin)) && !forgotten.contains(id) }
      .map { case (sh, id, n, _, _) => (sh, id, n) }
    val g1 = survivors.groupBy(_._1).toSeq.flatMap { case (sh, ms) =>
      val ordered = ms.sortBy { case (_, id, n) => (-n, id) }
      val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, scala.collection.mutable.ArrayBuffer[Long])]
      ordered.foreach { case (_, id, n) =>
        bins.indexWhere(_._1 >= n) match {
          case -1 => bins += ((2048L - n, scala.collection.mutable.ArrayBuffer(id)))
          case i  => val (rem, m) = bins(i); m += id; bins(i) = (rem - n, m)
        }
      }
      bins.zipWithIndex.flatMap { case ((_, m), b) =>
        m.zipWithIndex.map { case (id, seq) => (("g1", sh, b.toLong), id, seq.toLong) } }
    }
    val windows = g0 ++ g1
    // COMPLIANCE PIN: the reader's window set covers exactly the
    // survivor corpus, each doc once — no forgotten hash anywhere
    val members = windows.map(_._2)
    assert(members.toSet === allIds -- forgotten)
    assert(members.size === members.toSet.size, "each survivor packs exactly once")
    assert(forgotten.nonEmpty && contaminated.nonEmpty)
    // full permutation replay
    val wsig = windows.groupBy(_._1).view.mapValues(
      _.map { case (_, id, seq) => (seq + 1) * (h60(id.toString) % P) % P }.sum % P).toMap
    val exp = (for { e <- Seq(0, 1); ((gen, sh, bin), sig) <- wsig } yield {
      val k = md5hex(s"repoch$e:$gen:$sh:$bin")
      (e, (java.lang.Long.parseLong(k.take(15), 16) % 8).toInt, k, gen, sh, bin, 1L + sig)
    }).groupBy { case (e, rs, _, _, _, _, _) => (e, rs) }.map { case (key, ms) =>
      val ordered = ms.sortBy { case (_, _, k, gen, sh, bin, _) => (k, gen, sh, bin) }
      val n = ordered.size.toLong
      val half = n / 2
      val sigs = ordered.zipWithIndex.map { case ((_, _, _, _, _, _, h), i) =>
        val pos = i + 1L
        (pos * h % P, if (pos > half) (pos - half) * h % P else 0L)
      }
      def lbl(m: (Int, Int, String, String, Int, Long, Long)) = s"${m._4}:${m._5}:${m._6}"
      key -> ((n, lbl(ordered.head), lbl(ordered.last),
        sigs.map(_._1).sum % P, sigs.map(_._2).sum % P))
    }
    val got = LlmQueries.epochOrderRebuilt(spark, TestSpark.sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getString(3), r.getString(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got === exp)
  }

  test("epoch_order_resume plan: one scan, no self-union (explode fans out the epochs)") {
    val df = LlmQueries.epochOrderResume(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"epochs must come from one scan:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size === 1,
      s"exactly one corpus scan expected:\n$plan")
  }
}
