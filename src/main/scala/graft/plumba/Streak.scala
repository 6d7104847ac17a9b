package graft.plumba

/** Longest-run-length ("streak") fold in parallel-lawful segment form.
  *
  * The reference computes this with a non-mergeable `(best, current)`
  * accumulator (examples_fold.py:11–40) — correct but inherently
  * sequential. The segment state `(prefix, best, suffix, total)` is the
  * classic associative reformulation: any row range folds independently
  * and adjacent results combine, so [[CollectOps.collectFold]] can run it
  * as parallel per-partition partials — the 100 TB path for this query
  * family (SURVEY §2.2 "longest run-length streak").
  */
object Streak {
  /** (leading true-run, best run anywhere, trailing true-run, row count) */
  type S = (Long, Long, Long, Long)

  val neutral: S = (0L, 0L, 0L, 0L)

  def best(s: S): Long = s._2

  def combine(a: S, b: S): S = {
    val (ap, ab, as_, at) = a
    val (bp, bb, bs, bt) = b
    ( if (ap == at) at + bp else ap,
      math.max(math.max(ab, bb), as_ + bp),
      if (bs == bt) bt + as_ else bs,
      at + bt)
  }

  private def rowState(v: Boolean): S = if (v) (1L, 1L, 1L, 1L) else (0L, 0L, 0L, 1L)

  val merge: Kernel.Merge[S] = Kernel.Merge(neutral, combine)

  /** Streak-of-`pred` fold kernel over a single column. */
  def kernel[C](pred: C => Boolean): Kernel.Fold[S] =
    Kernel.Fold[S](
      neutral,
      (acc, args) => combine(acc, rowState(pred(args(0).asInstanceOf[C]))),
      merge = Some(merge))
}
