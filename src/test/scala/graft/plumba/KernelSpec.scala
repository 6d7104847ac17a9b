package graft.plumba

import org.scalatest.funsuite.AnyFunSuite
import graft.plumba.Kernel._

/** Pure (no-Spark) golden tests for the fold/scan kernel loops, pinned to
  * the reference's own asserted values (FIXTURES.md §A; citations into
  * /root/reference there). */
class KernelSpec extends AnyFunSuite {

  private def rows(vs: Seq[Seq[Any]]): Iterator[IndexedSeq[Any]] =
    vs.iterator.map(_.toIndexedSeq)

  private val addAll: (Double, IndexedSeq[Any]) => Double =
    (acc, args) => acc + args.map(_.asInstanceOf[Double]).sum

  test("A1 arity sweep 1..9 columns x extras: closed form 7 + sum(10^j) + n*extras") {
    for (n <- 1 to 9; extras <- Seq(Vector[Any](), Vector[Any](0.5), Vector[Any](0.25, 0.5))) {
      val row = (1 to n).map(j => math.pow(10, j): Any)
      val k = Fold[Double](7.0, addAll, extras)
      val got = foldRows(k, rows(Seq(row)))
      val want = 7.0 + (1 to n).map(math.pow(10, _)).sum + extras.map(_.asInstanceOf[Double]).sum
      assert(got == want, s"n=$n extras=$extras")
    }
  }

  test("A1 boundary: zero folded columns rejected at the ops layer") {
    // reference raises ValueError for 0 columns (src/polars_numba/__init__.py:272);
    // our check lives in CollectOps/GroupOps (requires a SparkSession) —
    // the pure loop over zero-width rows still folds args = extras only.
    val k = Fold[Double](1.0, addAll, Vector(2.0))
    assert(foldRows(k, rows(Seq(Seq(), Seq()))) == 5.0)
  }

  test("A2 fold drops null rows over selected columns: 134.5") {
    val data = Seq(Seq[Any](1L, 30L), Seq[Any](2L, null), Seq[Any](null, 50L), Seq[Any](3L, 100L))
    val k = Fold[Double](0.5, (acc, args) => acc + args.map(_.asInstanceOf[Long]).sum)
    assert(foldRows(k, rows(data)) == 134.5)
  }

  test("A2 scan emits null and keeps state: [31.5, null, null, 134.5]") {
    val data = Seq(Seq[Any](1L, 30L), Seq[Any](2L, null), Seq[Any](null, 50L), Seq[Any](3L, 100L))
    val k = Scan[Double](0.5, (acc, args) => acc + args.map(_.asInstanceOf[Long]).sum)
    val got = scanRows(k, rows(data)).toSeq
    assert(got == Seq(Some(31.5), None, None, Some(134.5)))
  }

  test("A3 multi-output scan with tuple acc: [[7,12],[9,14],null,null,[11,15]]") {
    val data = Seq(
      Seq[Any](1L, 3L), Seq[Any](2L, 2L), Seq[Any](null, 5L), Seq[Any](6L, null), Seq[Any](2L, 1L))
    val k = Scan[(Long, Long)](
      (6L, 9L),
      (acc, args) => (acc._1 + args(0).asInstanceOf[Long], acc._2 + args(1).asInstanceOf[Long]),
      emit = a => Seq(a._1, a._2))
    val got = scanRows(k, rows(data)).toSeq
    assert(got == Seq(Some(Seq(7L, 12L)), Some(Seq(9L, 14L)), None, None, Some(Seq(11L, 15L))))
  }

  test("A4 running max: [20,20,21,22,23,23,23,24,25]") {
    val prices = Seq(20L, 19L, 21L, 22L, 23L, 21L, 20L, 24L, 25L)
    val k = Scan.of1[Long, Long](0L)((acc, x) => math.max(acc, x))
    val got = scanRows(k, rows(prices.map(Seq[Any](_)))).toSeq
    assert(got.map(_.get) == Seq(20L, 20L, 21L, 22L, 23L, 23L, 23L, 24L, 25L))
  }

  test("A5 freezing-streak fold with tuple acc: 3") {
    val temps = Seq(2L, 0L, -2L, 3L, -2L, -1L, -4L, 1L, -1L)
    val k = Fold.of1[(Long, Long), Long]((0L, 0L)) { case ((best, cur), t) =>
      val c = if (t < 0) cur + 1 else 0L
      (math.max(best, c), c)
    }
    assert(foldRows(k, rows(temps.map(Seq[Any](_))))._1 == 3L)
  }

  test("A5 streak as a mergeable segment fold (parallel-lawful form)") {
    // Segment state (prefix, best, suffix, total) makes run-length
    // mergeable: this is the declared-associative path CollectOps uses.
    val temps = Seq(2L, 0L, -2L, 3L, -2L, -1L, -4L, 1L, -1L)
    val k = Streak.kernel[Long](_ < 0)
    val whole = foldRows(k, rows(temps.map(Seq[Any](_))))
    assert(Streak.best(whole) == 3L)
    // law: any split folds+merge == whole fold
    val m = k.merge.get
    for (cut <- 0 to temps.length) {
      val (l, r) = temps.splitAt(cut)
      val lf = foldRows(k, rows(l.map(Seq[Any](_))))
      val rf = foldRowsFrom(k, m.neutral, rows(r.map(Seq[Any](_))))
      assert(Streak.best(m.combine(lf, rf)) == 3L, s"cut=$cut")
    }
  }

  test("A6 credit-card balance (non-associative): scan [50,950,950,550,610], fold 610") {
    val purchases = Seq(50L, 900L, 70L, -400L, 60L)
    val limit = 1000L
    val step: (Long, IndexedSeq[Any]) => Long = (acc, args) => {
      val lim = args(0).asInstanceOf[Long]
      val x = args(1).asInstanceOf[Long]
      if (acc + x <= lim) acc + x else acc
    }
    val s = Scan[Long](0L, step, Vector(limit))
    assert(scanRows(s, rows(purchases.map(Seq[Any](_)))).toSeq.map(_.get) ==
      Seq(50L, 950L, 950L, 550L, 610L))
    val f = Fold[Long](50L, step, Vector(limit))
    assert(foldRows(f, rows(Seq(900L, 70L, -400L, 60L).map(Seq[Any](_)))) == 610L)
  }

  test("A8 multi-in/multi-out purchase orders: fold (960,23); scan trajectories") {
    val prices = Seq(5.0, 400.0, 70.0, 4.0, 60.0)
    val units = Seq(20.0, 2.0, 2.0, 10.0, 1.0)
    val step: ((Double, Double), IndexedSeq[Any]) => (Double, Double) = (acc, args) => {
      val (maxBal, maxUnits) = (args(0).asInstanceOf[Double], args(1).asInstanceOf[Double])
      val (p, u) = (args(2).asInstanceOf[Double], args(3).asInstanceOf[Double])
      val (bal, un) = acc
      if (bal + p * u <= maxBal && un + u <= maxUnits) (bal + p * u, un + u) else acc
    }
    val data = prices.zip(units).map { case (p, u) => Seq[Any](p, u) }
    val f = Fold[(Double, Double)]((0.0, 0.0), step, Vector(1000.0, 25.0))
    assert(foldRows(f, rows(data)) == ((960.0, 23.0)))
    val s = Scan[(Double, Double)]((0.0, 0.0), step, Vector(1000.0, 25.0), a => Seq(a._1, a._2))
    val got = scanRows(s, rows(data)).toSeq.map(_.get)
    assert(got.map(_.asInstanceOf[Seq[Double]].head) == Seq(100.0, 900.0, 900.0, 900.0, 960.0))
    assert(got.map(_.asInstanceOf[Seq[Double]](1)) == Seq(20.0, 22.0, 22.0, 22.0, 23.0))
  }

  test("A9 binding order: value-column order determines argument order (205.5)") {
    // reference: frame order beats parameter names (tests/test_collect_scan.py:95-104)
    // — in our API the caller's valueCols order is the binding, explicitly.
    val k = Fold.of2[Double, Long, Long](0.5)((acc, b, a) => acc + 10 * b + a)
    assert(foldRows(k, rows(Seq(Seq[Any](20L, 5L)))) == 205.5)
  }

  test("A9 casting: int-truncation emit (Float64 acc -> Int32 result)") {
    val vals = Seq(1.5, 2.25)
    val kF = Scan.of1[Double, Double](10.0)((acc, x) => acc + x)
    assert(scanRows(kF, rows(vals.map(Seq[Any](_)))).toSeq.map(_.get) == Seq(11.5, 13.75))
    val kI = Scan.of1[Double, Double](10.0, emit = a => a.toInt)((acc, x) => acc + x)
    assert(scanRows(kI, rows(vals.map(Seq[Any](_)))).toSeq.map(_.get) == Seq(11, 13))
  }
}
