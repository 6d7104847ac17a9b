package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Multimodal.imageDHash]] + [[Dedup.bitSignaturePairs]] — the image
  * near-dup composition (`media_dedup_features`). Pins the dHash bit
  * order and integer luminance against a plain-Scala replay on REAL
  * encoded images, the grid downsample rule, the null-signature policy
  * for non-images, and the pair semantics (planted near-dups found,
  * distinct textures never paired). */
class MediaDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-Scala dHash replay over known gray values in image coords. */
  private def dhashReplay(gray: Array[Array[Int]], grid: Int): String = {
    val h = gray.length; val w = gray(0).length
    val sb = new StringBuilder
    def lum(x: Int, y: Int): Long = 1000L * gray(y)(x)
    for (y <- 0 until grid; x <- 0 until grid - 1) {
      val a = lum(math.min(w - 1, x * w / grid), math.min(h - 1, y * h / grid))
      val b = lum(math.min(w - 1, (x + 1) * w / grid), math.min(h - 1, y * h / grid))
      sb.append(if (b > a) '1' else '0')
    }
    sb.toString
  }

  /** Encode a gray matrix (image coords, gray(y)(x)) as real PNG bytes. */
  private def pngBytes(gray: Array[Array[Int]]): Array[Byte] = {
    val h = gray.length; val w = gray(0).length
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = gray(y)(x)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) = {
    val b = rows.toDF("id", "bytes")
    b.select(col("id"),
      Multimodal.mediaStruct(col("bytes"), lit("image/png"), lit(0), lit(0), lit(1)).as("media"))
  }

  test("dHash bit order and integer luminance replay on a real decoded PNG") {
    val rnd = new scala.util.Random(7)
    val gray = Array.fill(8, 8)(rnd.nextInt(256))
    val out = Multimodal.imageDHash(mediaDf(Seq((1L, pngBytes(gray)))), "id", "media", grid = 8)
      .collect()
    assert(out.length === 1)
    assert(out.head.getString(1) === dhashReplay(gray, 8))
    assert(out.head.getString(1).length === 56)
  }

  test("grid downsample: a 16x16 image samples pixels at (x*w DIV grid, y*h DIV grid)") {
    val rnd = new scala.util.Random(11)
    val gray = Array.fill(16, 16)(rnd.nextInt(256))
    val out = Multimodal.imageDHash(mediaDf(Seq((1L, pngBytes(gray)))), "id", "media", grid = 4)
      .collect()
    assert(out.head.getString(1) === dhashReplay(gray, 4))
    assert(out.head.getString(1).length === 12)
  }

  test("non-image payloads and truncated images get a NULL signature, never a fake one") {
    val garbage = "this is not an image".getBytes("UTF-8")
    val truncated = pngBytes(Array.fill(4, 4)(9)).take(10) // magic survives, body gone
    val out = Multimodal.imageDHash(
        mediaDf(Seq((1L, garbage), (2L, truncated))), "id", "media")
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out === Map(1L -> true, 2L -> true))
  }

  test("bitSignaturePairs: planted near-dups pair, distinct signatures don't, nulls excluded") {
    val base = "1010110011010010"
    def flip(s: String, at: Int*) =
      at.foldLeft(s)((acc, i) => acc.updated(i, if (acc(i) == '1') '0' else '1'))
    val sigs = Seq(
      (1L, base), (2L, flip(base, 3)), (3L, flip(base, 3, 9)),
      (4L, "0101001100101101"), // complement-ish: far from base
      (5L, null.asInstanceOf[String]))
      .toDF("id", "sig")
    val pairs = Dedup.bitSignaturePairs(sigs, "id", "sig",
        nBits = 16, bands = 4, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs === Map((1L, 2L) -> 1, (1L, 3L) -> 2, (2L, 3L) -> 1))
  }

  test("simHashPairs portable path is unchanged by the bitSignaturePairs refactor") {
    val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
    val viaText = Dedup.simHashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaSig = Dedup.bitSignaturePairs(
        docs.select(col("doc_id"), Dedup.simHashBits(col("text")).as("s")),
        "doc_id", "s", nBits = 64, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaText === viaSig)
    assert(viaText.nonEmpty)
  }

  test("media_dedup_incremental: echoes hit the corpus index, new textures come back new") {
    val off = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
      .agg(max("doc_id")).head.getLong(0) + 1L
    val out = graft.queries.LlmQueries.mediaDedupIncremental(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.nonEmpty)
    def hb(id: Long): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(h.take(2), 16)
    }
    out.foreach { case (id, nDups, status) =>
      val orig = id - off
      assert(status === (if (nDups > 0) "dup_corpus" else "new"), s"doc $id")
      if (hb(orig) < 85)
        // an echo is pixel-identical to its original: at least that one
        // corpus image (hamming 0) must be found
        assert(nDups >= 1, s"echo of $orig must hit the index")
    }
    // both statuses fire, and echoes can match multiple cluster-mates
    assert(out.exists(_._3 == "new") && out.exists(_._3 == "dup_corpus"))
    assert(out.exists(_._2 > 1), "cluster-mates within hamming 4 should also match")
  }

  test("media_dedup_clusters: closure stays inside texture clusters; keep = min id") {
    val out = graft.queries.LlmQueries.mediaDedupClusters(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.nonEmpty)
    out.foreach { case (id, compo, keep) =>
      assert(id / 8 === compo / 8, s"component $compo crosses texture cluster of $id")
      assert(keep === (if (id == compo) 1 else 0))
    }
    // every component's label IS its minimum member
    out.groupBy(_._2).foreach { case (compo, members) =>
      assert(members.map(_._1).min === compo, s"component $compo label is not the min member")
    }
    // dedup actually deduplicates: strictly fewer keepers than members
    assert(out.count(_._3 == 1) < out.length)
  }

  test("media_dedup_features: pairs are exactly the planted same-pattern near-dups") {
    val out = graft.queries.LlmQueries.mediaDedupFeatures(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.nonEmpty)
    out.foreach { case (a, b, h) =>
      assert(a / 8 === b / 8, s"pair ($a, $b) crosses texture clusters")
      assert(h <= 4 && h >= 0)
    }
    // one noisy pixel flips at most 2 horizontal comparisons per doc
    assert(out.forall(_._3 <= 4))
    // exact-dup pairs exist (both noise pixels at coinciding positions
    // or flips that cancel) AND true near-dups exist (hamming > 0)
    assert(out.exists(_._3 > 0), "expected genuine near (not just exact) duplicates")
  }
}
