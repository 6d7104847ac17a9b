package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** [[Dedup.cdcChunks]]/[[Dedup.cdcDedup]] — the boundary rule replayed
  * in plain Scala, and the property the operator exists for: an
  * insertion SHIFTS every byte yet downstream chunks still dedup. */
class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  /** The same rule in plain Scala: cut after the window whose md5
    * lands in the boundary class; chunks between cuts. */
  private def cdc(text: String, window: Int = 16, mask: Int = 64): Seq[(Int, Int, String)] = {
    val cuts = (1 to text.length - window + 1)
      .filter(i => hash60(text.substring(i - 1, i - 1 + window)) % mask == 0)
      .map(_ + window - 1)
    val starts = 1 +: cuts.map(_ + 1)
    val ends = cuts :+ text.length
    starts.zip(ends).zipWithIndex.collect {
      case ((s, e), j) if e >= s => (j, s, md5hex(text.substring(s - 1, e)))
    }.map { case (j, s, h) => (j, s, h) }
  }

  test("chunking replays in plain Scala across the fixture") {
    val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
    val texts = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = texts.flatMap { case (id, t) =>
      cdc(t).map { case (j, s, h) => (id, j, s, h) }
    }.toSet
    val got = Dedup.cdcChunks(docs, "doc_id", "text")
      .select("doc_id", "chunk_idx", "start", "chunk_md5").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    assert(got === want)
  }

  test("a head insertion shifts every byte but post-boundary chunks still dedup") {
    // pick a fixture doc long enough to carry interior boundaries
    val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
    val base = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(r => cdc(r._2).length >= 3)
      .head
    val shifted = "zzzz inserted header " + base._2
    val pair = Seq((1L, base._2), (2L, shifted)).toDF("doc_id", "text")
    val dupes = Dedup.cdcDedup(pair, "doc_id", "text")
      .filter(col("n_docs") === 2).count()
    assert(dupes > 0, "CDC must re-synchronize after the insertion")
    // the fixed word-grid chunker gets re-framed by the same insertion:
    // CDC must recover at least as many cross-doc duplicate chunks
    val fixed = Dedup.chunkDedup(pair, "doc_id", "text").count()
    assert(dupes >= fixed,
      s"shift robustness is the point: cdc=$dupes fixed=$fixed")
  }

  test("incremental probe: echoed corpus docs read dup_ppm = 1e6, invariants hold") {
    val out = graft.queries.LlmQueries.dedupCdcIncremental(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.foreach { case (id, nChunks, nKnown, total, known, ppm) =>
      assert(nKnown <= nChunks && known <= total, s"doc $id")
      assert(ppm === known * 1000000L / total, s"doc $id ppm")
    }
    // echoed docs (id >= echo base) are byte-identical to corpus docs:
    // every chunk is known, dup_ppm is exactly 1e6
    val maxBase = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
      .agg(org.apache.spark.sql.functions.max("doc_id")).head.getLong(0)
    val echoes = out.filter(_._1 > maxBase)
    assert(echoes.nonEmpty, "fixture must contain echoed docs")
    echoes.foreach { case (id, n, k, _, _, ppm) =>
      assert(k === n && ppm === 1000000L, s"echoed doc $id must be fully known")
    }
  }

  test("a doc shorter than the window is one whole-text chunk") {
    val out = Dedup.cdcChunks(Seq((1L, "short")).toDF("doc_id", "text"),
        "doc_id", "text").collect()
    assert(out.length === 1)
    assert(out.head.getString(4) === md5hex("short"))
    assert(out.head.getLong(3) === 5L)
  }
}
