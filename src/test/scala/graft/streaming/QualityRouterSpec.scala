package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** The streaming quality router gate end-to-end on the test fixture:
  * the partitioned-sink layout IS the router, so the spec pins the
  * directory contract (disposition=... subdirs) and conservation (no
  * doc lost or duplicated across the split). */
class QualityRouterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("router splits the corpus losslessly into disposition partitions") {
    val out = graft.queries.StreamingQueries.streamQualityRouter(spark, TestSpark.sfDir)
      .collect()
    val dispositions = out.map(_.getString(0)).toSet
    assert(dispositions.subsetOf(Set("accept", "reject")) && dispositions.nonEmpty)
    val total = out.map(_.getLong(2)).sum
    val nDocs = graft.queries.Tables(spark, TestSpark.sfDir, "documents").count()
    assert(total === nDocs, s"routed $total of $nDocs docs")
    // the split must match the batch rule doc-for-doc
    val wantAccept = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
      .filter(graft.llm.TextAnalysis.qualityScore(col("text")) >= 0.8).count()
    val gotAccept = out.filter(_.getString(0) == "accept").map(_.getLong(2)).sum
    assert(gotAccept === wantAccept)
  }
}
