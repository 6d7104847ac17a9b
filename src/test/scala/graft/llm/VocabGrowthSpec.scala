package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[TextAnalysis.vocabGrowthCurve]] — the first-seen identity and the
  * curve's structural monotonicity, replayed in plain Scala. */
class VocabGrowthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")

  private def normalize(s: String): Array[String] =
    s.toLowerCase.replaceAll("[.,;:!?]", "").replaceAll(" +", " ").trim
      .split(" ").filter(_.nonEmpty)

  private lazy val got =
    TextAnalysis.vocabGrowthCurve(docs, "doc_id", "text", nPoints = 10)
      .orderBy("point").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("every point replays from the plain-Scala prefix scan") {
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), normalize(r.getString(1)))).sortBy(_._1)
    val n = rows.length.toLong
    // discrete decile boundaries over the doc_id histogram (ids unique)
    def boundary(k: Int): Long = {
      var cum = 0L
      rows.foreach { case (id, _) =>
        cum += 1
        if (cum * 1000000L >= n * k * 100000L) return id
      }
      rows.last._1
    }
    val want = (1 to 10).map { k =>
      val b = boundary(k)
      val prefix = rows.filter(_._1 <= b)
      (k, b, prefix.length.toLong, prefix.map(_._2.length.toLong).sum,
        prefix.iterator.flatMap(_._2).toSet.size.toLong)
    }
    assert(got.toSeq === want)
  }

  test("vocab and token counts are monotone; the last point covers the corpus") {
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3 && a._4 <= b._4 && a._5 <= b._5, s"non-monotone: $a -> $b")
    }
    val nDocs = docs.count()
    assert(got.last._3 === nDocs, "point 10 must cover every doc")
  }

  test("sub-linear growth on natural text: vocab grows slower than tokens") {
    val (v1, n1) = (got.head._5.toDouble, got.head._4.toDouble)
    val (v10, n10) = (got.last._5.toDouble, got.last._4.toDouble)
    // Heaps: V ~ N^beta with beta < 1 — the vocab growth FACTOR between
    // the first and last point must undercut the token growth factor
    assert(v10 / v1 < n10 / n1, s"vocab grew as fast as tokens: $got")
  }
}
