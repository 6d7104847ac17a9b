package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** [[Decontamination.noveltyReport]] — n-gram novelty vs a reference
  * gram universe. The replay test re-derives every count in plain
  * Scala (3-word shingles, distinct per doc, 60-bit md5 hashes); the
  * endpoint tests pin the two boundary semantics the metric exists
  * for: a verbatim copy scores 0 ppm, fully-unseen text 1 000 000. */
class NoveltySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  /** The library's shingle rule: lowercase, split on spaces, 3-word
    * windows (short docs yield their single truncated window),
    * DISTINCT hashes per doc. */
  private def shingles(text: String): Set[Long] = {
    val ws = text.toLowerCase.split(" +").filter(_.nonEmpty)
    val n = math.max(ws.length - 3, 0) + 1
    (0 until n).map(i => h60(ws.slice(i, i + 3).mkString(" "))).toSet
  }

  private val ref = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"))
  private val batch = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"), // verbatim copy
    (3L, "completely novel words never seen anywhere before now"), // all new
    (5L, "the quick brown fox sat on novel ground today")) // mixed

  private def run() = {
    val refDf = ref.toDF("doc_id", "text")
    val refGrams = Decontamination.referenceGramSet(refDf, "text")
    Decontamination.noveltyReport(refGrams, batch.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
  }

  test("matches the plain-Scala gram replay exactly") {
    val refSet = ref.flatMap { case (_, t) => shingles(t) }.toSet
    val want = batch.map { case (id, t) =>
      val g = shingles(t)
      val novel = g.count(!refSet(_)).toLong
      id -> ((g.size.toLong, novel, novel * 1000000L / g.size))
    }.toMap
    assert(run() === want)
  }

  test("a verbatim copy scores 0 ppm; fully-unseen text scores 1000000") {
    val got = run()
    assert(got(1L)._3 === 0L)
    assert(got(3L)._3 === 1000000L)
    val mixed = got(5L)._3
    assert(mixed > 0L && mixed < 1000000L, s"mixed doc must land strictly between, got $mixed")
  }

  test("docs shorter than one window still produce one truncated shingle") {
    val refGrams = Decontamination.referenceGramSet(Seq((0L, "tiny doc")).toDF("doc_id", "text"), "text")
    val got = Decontamination.noveltyReport(refGrams,
        Seq((1L, "tiny doc"), (3L, "other words")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(got(1L) === ((1L, 0L)))       // the same 2-word shingle: seen
    assert(got(3L) === ((1L, 1000000L))) // a different one: novel
  }

  test("probe join degrades gracefully: broadcast when the ref fits, h-shuffle when it can't") {
    val d = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
    val refGrams = Decontamination.referenceGramSet(d.filter(col("doc_id") % 2 === 0), "text")
    val probe = Decontamination.noveltyReport(refGrams, d.filter(col("doc_id") % 2 === 1),
      "doc_id", "text")
    // at fixture scale the tiny ref universe rightly BROADCASTS — the
    // batch side is probed scan-side with no join exchange at all
    val small = probe.queryExecution.executedPlan.toString
    assert(small.contains("BroadcastHashJoin"), s"small ref must broadcast:\n$small")
    // the corpus-sized-reference shape: with broadcast off (what the
    // planner decides when the universe exceeds the threshold) the join
    // becomes an h-keyed shuffle on BOTH sides — never a cartesian, and
    // the batch side enters it carrying only (id, h), text pruned
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = Decontamination.noveltyReport(refGrams, d.filter(col("doc_id") % 2 === 1),
        "doc_id", "text").queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning\\(h".r.findAllIn(big).size >= 2,
        s"both sides must partition by the gram hash:\n$big")
      assert(big.contains("SortMergeJoin"), s"expected a shuffle join on h:\n$big")
      assert(!big.contains("BroadcastNestedLoopJoin"), s"never a cartesian:\n$big")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(small.contains("AS id") && small.contains("explode(shingle_hash60"),
      s"batch join input must be the pruned (id, h) projection:\n$small")
  }
}
