package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Multimodal.audioFingerprint]] + the `media_audio_dedup` planting —
  * the audio modality riding [[Dedup.bitSignaturePairs]]. Replays the
  * two-seed waveform, frame energies and comparison bits in plain
  * Scala, and pins the RECALL contract the gate's docstring claims:
  * cluster-mates differ in at most the two bits their shared noise
  * frame touches (maxHamming 2 < bands 4 ⇒ guaranteed candidates), so
  * every within-cluster pair is found and no cross-cluster pair is. */
class AudioDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)

  /** The gate's closed form, end to end in plain Scala — md5 seed per
    * (cluster, frame); a single per-cluster additive seed truncates
    * mod 2^16 and manufactured 2.48 M phantom cross-cluster pairs at
    * the 10x probe (SCALE.md). */
  private def expectedSig(docId: Long): String = {
    val p = docId / 8
    val n = (200 + p % 57).toInt
    val nf = (p % 56).toInt
    val en = new Array[Long](57)
    val cnt = new Array[Long](57)
    (0 until n).foreach { k =>
      val f = (k.toLong * 57 / n).toInt
      val s0 = if (f == nf) h60(s"audn:$docId") else h60(s"aud:$p:$f")
      val v = Math.floorMod(s0 + k * 104729L, 65536L) - 32768L
      en(f) += math.abs(v); cnt(f) += 1
    }
    (0 until 56).map(f =>
      if (en(f) * cnt(f + 1) > en(f + 1) * cnt(f)) '1' else '0').mkString
  }

  // the gate's derivation rebuilt through the PUBLIC operator surface
  private lazy val sigs = {
    val d = graft.queries.Tables(spark, TestSpark.sfDir, "documents").select(col("doc_id"),
      expr("CAST(200 + (doc_id DIV 8) % 57 AS INT)").as("n"))
    val media = Multimodal.synthesizePcmPx(d, "doc_id", "n") { (id, _, n, k) =>
      val p = id / 8
      val f = (k.toLong * 57 / n).toInt
      val seed =
        if (f == (p % 56).toInt) Sampling.hash60Jvm(s"audn:$id")
        else Sampling.hash60Jvm(s"aud:$p:$f")
      (Math.floorMod(seed + k * 104729L, 65536L) - 32768L).toInt
    }
    Multimodal.audioFingerprint(media, "doc_id", "media", nFrames = 57)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("fingerprint bits replay the parsed-bytes energy deltas exactly") {
    assert(sigs.nonEmpty)
    sigs.foreach { case (id, sig) =>
      assert(sig.length === 56, s"doc $id sig length")
      assert(sig === expectedSig(id), s"doc $id fingerprint")
    }
  }

  test("cluster-mates differ only in the two bits the shared noise frame touches") {
    sigs.groupBy(_._1 / 8).foreach { case (p, ms) =>
      val nf = (p % 56).toInt
      val allowed = Set(nf - 1, nf).filter(_ >= 0)
      for (Seq((ia, sa), (ib, sb)) <- ms.toSeq.sortBy(_._1).combinations(2)) {
        val diff = (0 until 56).filter(i => sa(i) != sb(i))
        assert(diff.forall(allowed.contains),
          s"docs $ia/$ib (cluster $p, nf=$nf) differ at $diff")
      }
    }
  }

  test("pairs gate: full within-cluster recall, zero cross-cluster pairs") {
    val pairs = graft.queries.LlmQueries.mediaAudioDedup(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val got = pairs.map(p => (p._1, p._2)).toSet
    pairs.foreach { case (a, b, h) =>
      assert(a / 8 === b / 8, s"cross-cluster pair ($a,$b)")
      assert(h <= 2, s"pair ($a,$b) hamming $h")
    }
    // guaranteed recall: maxHamming < bands means every true pair has an
    // exact-matching band — all C(size,2) within-cluster pairs must appear
    sigs.keys.groupBy(_ / 8).foreach { case (p, ids) =>
      for (Seq(a, b) <- ids.toSeq.sorted.combinations(2))
        assert(got.contains((a, b)), s"missed within-cluster pair ($a,$b) of cluster $p")
    }
  }

  test("NULL / empty payloads fingerprint to NULL and never bucket") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](10, 0, 20, 0, 30, 0)), (2L, Array.emptyByteArray),
        (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "b")
      .select(col("id"), Multimodal.mediaStruct(col("b"), lit("audio/pcm"),
        lit(null), lit(null), lit(3)).as("media"))
    val out = Multimodal.audioFingerprint(df, "id", "media", nFrames = 3)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1).isDefined && out(1).get.length === 2)
    assert(out(2).isEmpty && out(3).isEmpty)
    val pairs = Dedup.bitSignaturePairs(
      Multimodal.audioFingerprint(df, "id", "media", nFrames = 3), "id", "sig",
      nBits = 2, bands = 2, maxHamming = 0)
    assert(pairs.count() === 0)
  }
}
