package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Delete path for the persisted media band indexes (`media_forget`,
  * `media_caption_forget`): the tombstone mask must (a) remove EXACTLY
  * the forgotten corpus members' matches — the live probe plus the
  * inverted (deleted-only) probe must reconstruct the unmasked census
  * row for row, (b) genuinely bite on the fixture (some echo re-encode
  * loses a corpus match), (c) leave every batch row with no deleted
  * match bit-identical, and (d) add ZERO hash exchanges over the plain
  * day-2 probe — a broadcast anti-join, never an index rewrite (the
  * AnnForgetSpec contract on the perceptual indexes). */
class MediaForgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private def census(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, String)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  private def checkFamily(name: String,
      probe: Option[String] => org.apache.spark.sql.DataFrame): Unit = {
    val deletes = Tables(spark, TestSpark.sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
      .filter(id => h60(s"forget:$id") % 50 == 0)
    assert(deletes.nonEmpty, s"$name: fixture must plant delete requests")
    val base = census(probe(None))
    val live = census(probe(Some("left_anti")))
    val dead = census(probe(Some("left_semi")))
    assert(live.keySet === base.keySet, s"$name: the mask must never drop a batch row")
    // distinct corpus matches split exactly into survivors + deleted:
    // the anti and semi probes are complementary views of one index
    base.foreach { case (id, (n, _)) =>
      assert(live(id)._1 + dead(id)._1 === n,
        s"$name: batch $id: live ${live(id)._1} + deleted ${dead(id)._1} != base $n")
      assert(live(id)._2 === (if (live(id)._1 > 0) "dup_corpus" else "new"),
        s"$name: batch $id status")
    }
    assert(dead.values.map(_._1).sum > 0,
      s"$name: fixture must delete at least one matched corpus member or the gate proves nothing")
    // rows that lost nothing are bit-identical to the unmasked probe
    val untouched = base.keySet.filter(id => dead(id)._1 == 0)
    assert(untouched.nonEmpty)
    untouched.foreach(id => assert(live(id) === base(id), s"$name: batch $id must not change"))
  }

  test("media_forget: deleted images stop matching; survivors account exactly; others bit-identical") {
    checkFamily("media", m => LlmQueries.mediaIncrementalProbe(spark, TestSpark.sfDir, m))
  }

  test("media_caption_forget: the composite index masks the same way") {
    checkFamily("caption", m => LlmQueries.captionIncrementalProbe(spark, TestSpark.sfDir, m))
  }

  test("media_audio_forget: the PCM band index masks the same way") {
    checkFamily("audio", m => LlmQueries.audioIncrementalProbe(spark, TestSpark.sfDir, m))
  }

  test("media_video_forget: the majority-signature band index masks the same way") {
    checkFamily("video", m => LlmQueries.videoIncrementalProbe(spark, TestSpark.sfDir, m))
  }

  test("plan: broadcast anti-join mask, bucketed index scan kept, zero added hash exchanges") {
    def hashEx(p: String): Int = "Exchange hashpartitioning".r.findAllIn(p).size
    Seq(
      ("media", LlmQueries.mediaIncrementalProbe(spark, TestSpark.sfDir, None),
        LlmQueries.mediaForget(spark, TestSpark.sfDir)),
      ("caption", LlmQueries.captionIncrementalProbe(spark, TestSpark.sfDir, None),
        LlmQueries.mediaCaptionForget(spark, TestSpark.sfDir)),
      ("audio", LlmQueries.audioIncrementalProbe(spark, TestSpark.sfDir, None),
        LlmQueries.mediaAudioForget(spark, TestSpark.sfDir)),
      ("video", LlmQueries.videoIncrementalProbe(spark, TestSpark.sfDir, None),
        LlmQueries.mediaVideoForget(spark, TestSpark.sfDir))
    ).foreach { case (name, baseDf, forgDf) =>
      val pBase = baseDf.queryExecution.executedPlan.toString
      val pForg = forgDf.queryExecution.executedPlan.toString
      assert(pForg.contains("LeftAnti"), s"$name mask must be an anti-join:\n$pForg")
      assert(pForg.contains("Bucketed: true"),
        s"$name probe must still read the bucketed index:\n$pForg")
      assert(hashEx(pForg) === hashEx(pBase),
        s"$name delete path must add no shuffle (base ${hashEx(pBase)}, forget ${hashEx(pForg)})")
    }
  }
}
