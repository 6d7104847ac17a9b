package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[graft.queries.LlmQueries.annIvfAppendAudit]] — the post-append
  * health audit. Pins the census arithmetic, the frozen-centroid
  * routing (built cells are a subset of appended occupancy), and the
  * recall bounds. */
class IvfAppendAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val rows =
    graft.queries.LlmQueries.annIvfAppendAudit(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap

  test("two phases; the appended corpus holds exactly corpus + batch vectors") {
    assert(rows.keySet === Set("built", "appended"))
    val (nB, _, _, _, _, _) = rows("built")
    val (nA, _, _, _, _, _) = rows("appended")
    assert(nA === 2 * nB, "the echo batch doubles the corpus")
  }

  test("census invariants: shares are valid ppm, occupancy never shrinks on append") {
    rows.foreach { case (ph, (n, cells, share, _, _, _)) =>
      assert(cells >= 1 && cells <= 16, s"$ph cells")
      // max share is at least the balanced share and at most 1e6
      assert(share >= 1000000L / math.max(cells, 1) && share <= 1000000L, s"$ph share $share")
      assert(n > 0)
    }
    assert(rows("appended")._2 >= rows("built")._2,
      "appending can only fill cells, never empty them")
  }

  test("recall: denominators are 5 per query, hits within bounds, built recall high") {
    rows.foreach { case (ph, (_, _, _, nExact, nHits, pct)) =>
      assert(nExact === 50L, s"$ph: 10 queries x k=5")
      assert(nHits >= 0 && nHits <= nExact)
      assert(pct === nHits * 100 / nExact, s"$ph recall arithmetic")
    }
    // the built-phase probe at nProbe=4/16 holds the recall floor the
    // recall-curve gate established; the appended phase is REPORTED
    // (that's the audit's whole point), only sanity-bounded here
    assert(rows("built")._6 >= 50, s"built recall collapsed: ${rows("built")}")
    assert(rows("appended")._6 >= 30, s"appended recall collapsed: ${rows("appended")}")
  }
}
