package graft.plumba

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.plumba.Kernel._

/** Property tests for the kernel laws (the reference's parametrized
  * arity sweep, adapted per SURVEY §5):
  *  - merge law: fold(init, xs++ys) == merge(fold(init,xs), fold(neutral,ys))
  *  - scan/fold consistency: scan's last emitted value == fold
  *  - null policies over random null placements
  */
class KernelPropertySpec extends AnyFunSuite {

  /** Minimal ScalaCheck runner (scalatestplus bridge is not on the
    * offline classpath). */
  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def rows(xs: Seq[Option[Long]]): Iterator[IndexedSeq[Any]] =
    xs.iterator.map(v => IndexedSeq[Any](v.map(Long.box).orNull))

  private val genVals: Gen[List[Option[Long]]] =
    Gen.listOf(Gen.frequency(4 -> Gen.choose(-100L, 100L).map(Some(_)), 1 -> Gen.const(None)))

  test("merge law holds for sum fold at any split point") {
    val k = Fold.of1[Long, Long](7L, merge = Some(Merge(0L, (a: Long, b: Long) => a + b)))((a, x) => a + x)
    check(Prop.forAll(genVals, Gen.choose(0, 100)) { (xs, cutRaw) =>
      val cut = if (xs.isEmpty) 0 else cutRaw % (xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      val whole = foldRows(k, rows(xs))
      val m = k.merge.get
      val split = m.combine(foldRows(k, rows(l)), foldRowsFrom(k, m.neutral, rows(r)))
      whole == split
    })
  }

  test("merge law holds for streak segment fold at any split point") {
    val k = Streak.kernel[Long](_ > 0)
    check(Prop.forAll(genVals, Gen.choose(0, 100)) { (xs, cutRaw) =>
      val cut = if (xs.isEmpty) 0 else cutRaw % (xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      val m = k.merge.get
      val whole = Streak.best(foldRows(k, rows(xs)))
      val split = Streak.best(m.combine(foldRows(k, rows(l)), foldRowsFrom(k, m.neutral, rows(r))))
      whole == split
    })
  }

  test("scan's last non-null emission equals fold over the same rows") {
    check(Prop.forAll(genVals) { xs =>
      val f = Fold.of1[Long, Long](3L)((a, x) => a + 2 * x)
      val s = Scan.of1[Long, Long](3L)((a, x) => a + 2 * x)
      val scanned = scanRows(s, rows(xs)).toSeq
      val folded = foldRows(f, rows(xs))
      scanned.flatten.lastOption.getOrElse(3L) == folded
    })
  }

  test("null policy: fold == fold over non-null subset; scan emits None exactly at nulls") {
    check(Prop.forAll(genVals) { xs =>
      val f = Fold.of1[Long, Long](0L)((a, x) => a + x)
      val s = Scan.of1[Long, Long](0L)((a, x) => a + x)
      val dropped = foldRows(f, rows(xs.filter(_.isDefined)))
      val direct = foldRows(f, rows(xs))
      val nullsAt = scanRows(s, rows(xs)).toSeq.map(_.isEmpty)
      direct == dropped && nullsAt == xs.map(_.isEmpty)
    })
  }

  test("two-pass prefix-scan decomposition == sequential scan at any partitioning") {
    // the exact math CollectOps.collectScanMergeable runs distributed:
    // pass 1 folds each contiguous partition's segment state from
    // neutral (nulls skip), prefixes = scanLeft over partials, pass 2
    // re-scans each partition from its prefix. Checked for a
    // commutative kernel (sum) and an ORDER-SENSITIVE one (last-wins),
    // which would expose any partition-order mistake.
    def twoPass(k: Scan[Long], xs: List[Option[Long]], nParts: Int): List[Option[Long]] = {
      val m = k.merge.get
      val size = math.max(1, (xs.length + nParts - 1) / nParts)
      val parts = if (xs.isEmpty) List(Nil) else xs.grouped(size).toList
      val partials = parts.map { p =>
        var acc = m.neutral
        p.foreach(v => if (v.isDefined) acc = k.step(acc, IndexedSeq(Long.box(v.get))))
        acc
      }
      val prefixes = partials.scanLeft(k.init)(m.combine)
      parts.zip(prefixes).flatMap { case (p, seed) =>
        var acc = seed
        p.map(v =>
          if (v.isEmpty) None
          else { acc = k.step(acc, IndexedSeq(Long.box(v.get))); Some(acc) })
      }
    }
    val sumK = Scan.of1[Long, Long](5L, merge = Some(Merge(0L, (a: Long, b: Long) => a + b)))(_ + _)
    // last-wins: neutral = "segment saw nothing" sentinel
    val lastK = Scan.of1[Long, Long](Long.MinValue,
      merge = Some(Merge(Long.MinValue, (a: Long, b: Long) => if (b == Long.MinValue) a else b)))(
      (_, x) => x)
    check(Prop.forAll(genVals, Gen.choose(1, 8)) { (xs, nParts) =>
      Seq(sumK, lastK).forall { k =>
        val seqScan = scanRows(k, rows(xs)).toList.map(_.map(_.asInstanceOf[Long]))
        twoPass(k, xs, nParts).map(_.map(identity[Long])) == seqScan
      }
    })
  }

  test("commutative merge law: fold is permutation-invariant (the sort-skip's premise)") {
    // exactly the math the collectFold commutative fast path runs: rows
    // land in arbitrary partitions in arbitrary order, each partition
    // folds from neutral, partials combine in arbitrary order onto init.
    // Long addition is exactly commutative, so the unsorted result must
    // equal the ordered sequential fold bit-for-bit.
    val k = Fold.of1[Long, Long](7L,
      merge = Some(Merge(0L, (a: Long, b: Long) => a + b, commutative = true)))((a, x) => a + x)
    val m = k.merge.get
    assert(m.commutative)
    check(Prop.forAll(genVals, Gen.choose(1, 8), Gen.choose(0L, Long.MaxValue)) { (xs, nParts, seed) =>
      val ordered = foldRows(k, rows(xs))
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(xs)
      val size = math.max(1, (shuffled.length + nParts - 1) / nParts)
      val parts = if (shuffled.isEmpty) List(Nil) else shuffled.grouped(size).toList
      val partials = rnd.shuffle(parts.map(p => foldRowsFrom(k, m.neutral, rows(p))))
      partials.foldLeft(k.init)(m.combine) == ordered
    })
  }

  test("arity sweep: generic step binds extras then columns for 1..12 columns") {
    // lifts the reference's 9-column cap (tested beyond it)
    for (n <- 1 to 12) {
      val k = Fold[Double](7.0, (a, args) => a + args.map(_.asInstanceOf[Double]).sum, Vector(0.25, 0.5))
      val row = (1 to n).map(j => math.pow(10, j): Any)
      val got = foldRows(k, Iterator(row.toIndexedSeq))
      assert(got == 7.0 + 0.75 + (1 to n).map(math.pow(10, _)).sum)
    }
  }
}
