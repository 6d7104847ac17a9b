package graft.operators

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** IntervalJoin differentials: the bucketed overlap join must produce
  * EXACTLY the pairs a naive all-pairs overlap scan produces — once
  * each (the owner-bucket rule), for any bucket width, including
  * negative endpoints (floor-division territory) and ns-scale epochs
  * (past 2^53, where double arithmetic would mis-bucket). */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop, cases: Int): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  private def run(
      left: Seq[(Long, Long, Long)],   // (id, lo, hi)
      right: Seq[(Long, Long, Long)],
      w: Long): Seq[(Long, Long)] = {
    val l = left.toDF("a_id", "a_lo", "a_hi")
    val r = right.toDF("b_id", "b_lo", "b_hi")
    IntervalJoin.overlapJoin(l, r, "a_lo", "a_hi", "b_lo", "b_hi", w)
      .select("a_id", "b_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
  }

  private def naive(
      left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)]): Seq[(Long, Long)] =
    for {
      (aid, alo, ahi) <- left
      (bid, blo, bhi) <- right
      if alo <= bhi && blo <= ahi
    } yield (aid, bid)

  test("overlapJoin == naive all-pairs overlap, exactly once, any width") {
    val genIv = Gen.listOfN(12, Gen.zip(Gen.choose(-50L, 50L), Gen.choose(0L, 40L)))
    check(Prop.forAll(genIv, genIv, Gen.choose(1L, 60L)) { (ls, rs, w) =>
      val left = ls.zipWithIndex.map { case ((lo, len), i) => (i.toLong, lo, lo + len) }
      val right = rs.zipWithIndex.map { case ((lo, len), i) => (100L + i, lo, lo + len) }
      val got = run(left, right, w)
      val want = naive(left, right)
      // sorted multiset equality: every pair present AND present once
      got.sorted == want.sorted
    }, cases = 12)
  }

  test("ns-scale epochs bucket exactly (past double precision)") {
    val base = 1700000000000000000L // ~1.7e18 ns
    val day = 86400L * 1000000000L
    // interval ends exactly on a bucket boundary and a point sits one ns
    // either side of it — double floor-division flips these
    val left = Seq((1L, base, base + day), (2L, base + day + 1, base + 2 * day))
    val right = Seq((100L, base + day, base + day), (101L, base + day - 1, base + day - 1))
    val got = run(left, right, day)
    val want = naive(left, right)
    assert(got.sorted == want.sorted)
    // closed-interval boundary: the point AT base+day touches interval 1
    // (which ends there) but not interval 2 (which starts 1 ns later)
    assert(want.sorted == Seq((1L, 100L), (1L, 101L)))
  }

  test("equi-keys restrict pairs to matching keys") {
    val l = Seq((1L, 10L, 0L, 20L), (2L, 20L, 0L, 20L))
      .toDF("a_id", "k", "a_lo", "a_hi")
    val r = Seq((100L, 10L, 5L, 6L), (101L, 20L, 5L, 6L), (102L, 10L, 100L, 110L))
      .toDF("b_id", "bk", "b_lo", "b_hi")
    val got = IntervalJoin.overlapJoin(l, r, "a_lo", "a_hi", "b_lo", "b_hi",
        bucketWidth = 7, equiKeys = Seq(("k", "bk")))
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 101L)))
  }
}
