package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** [[Decontamination.overlapByBenchmark]] — attribution semantics on a
  * crafted two-benchmark fixture. */
class DecontamReportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // eval: docs 1 (bench A) and 2 (bench B); training: 10 overlaps A
  // heavily, 11 overlaps B with exactly one shared trigram, 12 is clean
  private val docs = Seq(
    (1L, "A", true, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "B", true, "pack my box with five dozen liquor jugs again today"),
    (10L, "t", false, "the quick brown fox jumps over a sleeping cat"),
    (11L, "t", false, "she will pack my box quickly and leave today"),
    (12L, "t", false, "completely unrelated sentence about glaciers and moss"))

  private lazy val out = {
    val df = docs.toDF("doc_id", "bench", "is_eval", "text")
    Decontamination.overlapByBenchmark(df, col("is_eval"), "bench",
        "doc_id", "text", n = 3, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
  }

  test("overlap is attributed to the RIGHT benchmark only") {
    val byDoc = out.groupBy(_._1)
    assert(byDoc(10L).map(_._2).toSet === Set("A"), s"doc 10: ${out.toSeq}")
    assert(byDoc(11L).map(_._2).toSet === Set("B"), s"doc 11: ${out.toSeq}")
    assert(!byDoc.contains(12L), s"clean doc must not appear: ${out.toSeq}")
  }

  test("the contamination flag applies the threshold per benchmark") {
    val d10 = out.find(r => r._1 == 10L && r._2 == "A").get
    assert(d10._3 >= 2 && d10._4 === 1, s"doc 10 crosses minOverlap=2: $d10")
    val d11 = out.find(r => r._1 == 11L && r._2 == "B").get
    assert(d11._3 === 1L && d11._4 === 0, s"doc 11 has one shared trigram: $d11")
  }
}
