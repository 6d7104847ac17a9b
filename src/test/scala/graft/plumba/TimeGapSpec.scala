package graft.plumba

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import java.time.Duration

/** [[TimeGap]] — the Datetime/Duration kernel (SURVEY §1.3 type surface;
  * reference src/polars_numba/__init__.py:408–424): merge law at every
  * split point, golden gaps, and the temporal external-type dispatch. */
class TimeGapSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def tsRows(us: Seq[Long]): Iterator[IndexedSeq[Any]] =
    us.iterator.map(u => IndexedSeq[Any](java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(u / 1000000L, (u % 1000000L) * 1000L))))

  // sorted strictly-increasing epoch-µs sequences (consecutive-gap
  // semantics assume ordered input, as the group fold guarantees)
  private val genSorted: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, 4102444800L)).map(_.map(_ * 1000000L).distinct.sorted)

  test("merge law holds at any split point") {
    val k = TimeGap.kernel
    val m = k.merge.get
    check(Prop.forAll(genSorted, Gen.choose(0, 100)) { (xs, cutRaw) =>
      val cut = if (xs.isEmpty) 0 else cutRaw % (xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      val whole = Kernel.foldRows(k, tsRows(xs))
      val split = m.combine(Kernel.foldRows(k, tsRows(l)),
        Kernel.foldRowsFrom(k, m.neutral, tsRows(r)))
      whole == split
    })
  }

  test("golden: max gap of [0d, 3d, 4d, 10d] is 6 days; singleton/empty emit null") {
    val day = 86400000000L
    val s = Kernel.foldRows(TimeGap.kernel, tsRows(Seq(0L, 3 * day, 4 * day, 10 * day)))
    assert(TimeGap.emit(s) == Duration.ofDays(6))
    assert(TimeGap.emit(Kernel.foldRows(TimeGap.kernel, tsRows(Seq(5 * day)))) == null)
    assert(TimeGap.emit(TimeGap.empty) == null)
  }

  test("fold agrees across every temporal external shape Spark can hand a kernel") {
    val day = 86400000000L
    val us = Seq(0L, 2 * day, 7 * day)
    def fold(rows: Iterator[IndexedSeq[Any]]): Any =
      TimeGap.emit(Kernel.foldRows(TimeGap.kernel, rows))
    val viaTs = fold(tsRows(us))
    val viaInstant = fold(us.iterator.map(u =>
      IndexedSeq[Any](java.time.Instant.ofEpochSecond(u / 1000000L, (u % 1000000L) * 1000L))))
    val viaLdt = fold(us.iterator.map(u => IndexedSeq[Any](
      java.time.LocalDateTime.ofEpochSecond(u / 1000000L, ((u % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC))))
    val viaNanos = fold(us.iterator.map(u => IndexedSeq[Any](Long.box(u * 1000L))))
    assert(viaTs == Duration.ofDays(5))
    assert(viaInstant == viaTs && viaLdt == viaTs && viaNanos == viaTs)
  }
}
