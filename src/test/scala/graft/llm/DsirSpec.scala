package graft.llm

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Sampling.dsirScores]] / [[Sampling.dsirSelect]] — hashed n-gram
  * importance resampling (the DSIR recipe).
  *
  * The main test replays the ENTIRE pipeline in plain Scala — md5
  * bucket hashing included — and asserts exact integer score equality,
  * the same replay discipline the DuckDB oracle applies at the catalog
  * gate. Bucket collisions (however the 1024-way hash lands) affect
  * both sides identically by construction, so the equality is exact
  * regardless of where the fixture's grams collide. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // fixture: two disjoint vocabularies plus a mixed doc. Target docs
  // (is_target) speak sun/moon/star; raw-only docs speak rock/mud/dirt;
  // doc 4 mixes. Target-exclusive grams have c_target = c_raw (w = 0);
  // raw-exclusive grams have c_target = 0 (w = -lg(c_raw + 1) <= 0), so
  // target-looking docs must outscore raw-only docs.
  private val docs: Seq[(Long, Boolean, String)] = Seq(
    (0L, true, "sun moon star"),
    (1L, true, "sun star sun moon"),
    (2L, false, "rock mud dirt rock"),
    (3L, false, "mud dirt mud rock dirt"),
    (4L, false, "sun moon rock"),
    (5L, false, "star moon sun"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  /** floor(log2 c) for c >= 1 — the `length(bin(c)) - 1` identity. */
  private def lg(c: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(c)

  private val nBuckets = 1024

  /** The whole pipeline, re-derived independently: gram instances →
    * hashed buckets → add-one floor-log2 ratio weights → per-doc sums. */
  private def expected: Map[Long, (Long, Long)] = {
    val grams = docs.flatMap { case (id, tgt, text) =>
      val ws = text.split(" ").filter(_.nonEmpty).toSeq
      val big = if (ws.size >= 2) ws.sliding(2).map(_.mkString(" ")).toSeq else Seq()
      (ws ++ big).map(g => (id, tgt, hash60(g) % nBuckets))
    }
    val w = grams.groupBy(_._3).map { case (b, gs) =>
      b -> (lg(gs.count(_._2) + 1L) - lg(gs.size + 1L))
    }
    grams.groupBy(_._1).map { case (id, gs) =>
      id -> (gs.size.toLong, gs.map(g => w(g._3)).sum)
    }
  }

  private lazy val fixture =
    docs.toDF("doc_id", "is_target", "text")

  test("dsirScores matches the plain-Scala replay bit-for-bit") {
    val got = Sampling.dsirScores(fixture, "doc_id", "text",
        col("is_target"), nBuckets)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
  }

  test("target-vocabulary docs outscore raw-only docs") {
    val sc = expected.map { case (id, (_, s)) => id -> s }
    // every target-vocab doc (0, 1, 5) strictly above every raw-only
    // doc (2, 3); the mixed doc 4 sits strictly between the groups
    val targetMin = Seq(0L, 1L, 5L).map(sc).min
    val rawMax = Seq(2L, 3L).map(sc).max
    assert(targetMin > sc(4L) && sc(4L) > rawMax,
      s"expected target > mixed > raw-only, got $sc")
  }

  test("dsirSelect flags exactly topN docs, the top by (score desc, id asc)") {
    val rows = Sampling.dsirSelect(fixture, "doc_id", "text",
        col("is_target"), topN = 3, nBuckets = nBuckets)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    assert(rows.length === docs.size) // selection flags, never filters
    val wantSelected = rows.sortBy { case (id, s, _) => (-s, id) }
      .take(3).map(_._1).toSet
    assert(rows.filter(_._3 == 1).map(_._1).toSet === wantSelected)
    assert(rows.count(_._3 == 1) === 3)
  }

  test("scores are invariant under repartitioning") {
    val got = Sampling.dsirScores(fixture.repartition(7), "doc_id", "text",
        col("is_target"), nBuckets)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
  }

  test("dsirScoreFrozen with in-corpus weights reproduces dsirScores exactly") {
    val w = Sampling.dsirWeights(fixture, "doc_id", "text",
      org.apache.spark.sql.functions.col("is_target"), nBuckets)
    val frozen = Sampling.dsirScoreFrozen(w, fixture, "doc_id", "text", nBuckets)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(frozen === expected)
  }

  test("frozen scoring maps unseen buckets to the add-one rule's zero") {
    // weight map replay over the training fixture
    val trainGrams = docs.flatMap { case (_, tgt, text) =>
      val ws = text.split(" ").filter(_.nonEmpty).toSeq
      val big = if (ws.size >= 2) ws.sliding(2).map(_.mkString(" ")).toSeq else Seq()
      (ws ++ big).map(g => (tgt, hash60(g) % nBuckets))
    }
    val wMap = trainGrams.groupBy(_._2).map { case (b, gs) =>
      b -> (lg(gs.count(_._1) + 1L) - lg(gs.size + 1L))
    }
    // a novel-vocabulary batch: every gram bucket scored via the map
    // with default 0 — the exact contract of the frozen left join
    val novel = Seq((99L, false, "quux corge grault")).toDF("doc_id", "is_target", "text")
    val ws = "quux corge grault".split(" ").toSeq
    val grams = ws ++ ws.sliding(2).map(_.mkString(" ")).toSeq
    val want = grams.map(g => wMap.getOrElse(hash60(g) % nBuckets, 0L)).sum
    val w = Sampling.dsirWeights(fixture, "doc_id", "text",
      org.apache.spark.sql.functions.col("is_target"), nBuckets)
    val got = Sampling.dsirScoreFrozen(w, novel, "doc_id", "text", nBuckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((99L, grams.size.toLong, want)))
  }

  test("single-token and empty docs: no descending-sequence bigrams, empty drops out") {
    val tiny = Seq((0L, true, "solo"), (1L, false, ""), (2L, false, "a b"))
      .toDF("doc_id", "is_target", "text")
    val got = Sampling.dsirScores(tiny, "doc_id", "text",
        col("is_target"), nBuckets)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 0: one unigram, NO bigram; doc 1: no grams at all (absent);
    // doc 2: two unigrams + one bigram
    assert(got === Map(0L -> 1L, 2L -> 3L))
  }
}
