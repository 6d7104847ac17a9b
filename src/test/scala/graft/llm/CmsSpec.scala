package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Sketches]] — the Count-Min heavy-hitter family. The main test
  * replays the whole sketch (md5 bucket hashes, counter matrix,
  * integer-min estimates) in plain Scala and asserts exact equality;
  * a width-2 fixture forces collisions to show the one-sided
  * overcount the theory promises, still bit-exactly replayed. */
class CmsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private val docs = Seq(
    "alpha beta beta gamma",
    "alpha alpha delta",
    "beta gamma gamma gamma epsilon",
    "zeta")

  /** The whole pipeline re-derived: token counts → counter matrix →
    * min-estimate per token. */
  private def replay(depth: Int, width: Int): Map[String, (Long, Long)] = {
    val counts = docs.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    val matrix = counts.toSeq
      .flatMap { case (t, c) =>
        (0 until depth).map(i => (i, hash60(s"cms:$i:$t") % width) -> c) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    counts.map { case (t, c) =>
      t -> (c, (0 until depth).map(i => matrix((i, hash60(s"cms:$i:$t") % width))).min)
    }
  }

  private lazy val fixture = docs.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("audit matches the plain-Scala replay bit-for-bit (4x256)") {
    val expected = replay(4, 256)
    val topTokens = expected.toSeq
      .sortBy { case (t, (c, _)) => (-c, t) }.take(3).map(_._1).toSet
    val got = Sketches.cmsHeavyHitterAudit(fixture, "text", 4, 256, k = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === topTokens)
    got.foreach { case (t, pair) => assert(pair === expected(t), s"token $t") }
  }

  test("width-2 collisions overcount, never undercount, and replay exactly") {
    val expected = replay(4, 2)
    val got = Sketches.cmsHeavyHitterAudit(fixture, "text", 4, 2, k = 6)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 6)
    got.foreach { case (t, c, est, err) =>
      assert((c, est) === expected(t), s"token $t")
      assert(err === est - c && err >= 0, s"one-sided bound violated at $t")
    }
    // 6 tokens into 2 buckets MUST collide somewhere: some estimate
    // strictly exceeds truth, or the fixture tests nothing
    assert(got.exists(_._4 > 0), "expected at least one collision overcount")
  }

  test("join-size estimate matches the replay and never undercounts") {
    val a = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    val b = Seq(1L, 2L, 2L, 2L, 4L).toDF("k")
    // exact |a join b| on k: 3*1 + 1*3 = 6
    def matrix(df: org.apache.spark.sql.DataFrame, depth: Int,
        width: Int): Map[(Int, Long), Long] =
      df.select(org.apache.spark.sql.functions.col("k").cast("string"))
        .collect().map(_.getString(0)).toSeq
        .flatMap(t => (0 until depth).map(i => (i, hash60(s"cms:$i:$t") % width)))
        .groupBy(x => x).map { case (cell, v) => cell -> v.size.toLong }
    def est(depth: Int, width: Int): Long = {
      val (ma, mb) = (matrix(a, depth, width), matrix(b, depth, width))
      (0 until depth).map(i =>
        ma.collect { case ((r, bk), c) if r == i && mb.contains((r, bk)) =>
          c * mb((r, bk)) }.sum).min
    }
    for ((d, w) <- Seq((4, 256), (4, 2), (2, 4))) {
      val got = Sketches.cmsJoinSizeEstimate(
          Sketches.cmsKeyCounters(a, "k", d, w), Sketches.cmsKeyCounters(b, "k", d, w), d)
        .collect()(0).getLong(0)
      assert(got === est(d, w), s"depth=$d width=$w")
      assert(got >= 6L, s"one-sided bound violated at depth=$d width=$w")
    }
    // a roomy sketch has no collisions: the estimate IS the exact size
    assert(Sketches.cmsJoinSizeEstimate(
      Sketches.cmsKeyCounters(a, "k", 4, 4096),
      Sketches.cmsKeyCounters(b, "k", 4, 4096)).collect()(0).getLong(0) === 6L)
  }

  test("disjoint key sets estimate zero when any hash row has no shared bucket") {
    val a = Seq(1L, 2L, 3L).toDF("k")
    val b = Seq(100L, 200L, 300L).toDF("k")
    // a roomy sketch separates the six keys: at least one of the four
    // hash rows has disjoint buckets, and the estimate must read the
    // empty join as 0 — not a min over collision rows only
    val est = Sketches.cmsJoinSizeEstimate(
      Sketches.cmsKeyCounters(a, "k", 4, 4096),
      Sketches.cmsKeyCounters(b, "k", 4, 4096), 4).collect()(0).getLong(0)
    assert(est === 0L)
  }

  test("null join keys are dropped like equi-join semantics") {
    val withNulls = Seq(Some(1L), None, Some(1L), None).toDF("k")
    val m = Sketches.cmsKeyCounters(withNulls, "k", 4, 64)
      .agg(org.apache.spark.sql.functions.sum("c")).collect()(0).getLong(0)
    assert(m === 8L) // 2 non-null instances x depth 4
  }

  test("counter matrix is partitioning-invariant") {
    val a = Sketches.cmsCounters(fixture, "text", 4, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val b = Sketches.cmsCounters(fixture.repartition(5), "text", 4, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }
}
