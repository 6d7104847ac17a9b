package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[CosTopKAgg]] — the streaming-legal exact top-k aggregate. */
class StreamingTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    (1L, 0.9, 10L), (1L, 0.7, 11L), (1L, 0.9, 9L), (1L, 0.1, 12L),
    (2L, 0.5, 20L), (2L, 0.5, 21L))
    .toDF("g", "cos", "id")

  private def run(df: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Seq[Long]] =
    df.groupBy("g").agg(CosTopKAgg.column(k, col("cos"), col("id")).as("top"))
      .select(col("g"), col("top").getField("ids").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  test("ranks by (score desc, id asc), trims to k") {
    assert(run(rows, 2) === Map(1L -> Seq(9L, 10L), 2L -> Seq(20L, 21L)))
    assert(run(rows, 10) === Map(1L -> Seq(9L, 10L, 11L, 12L), 2L -> Seq(20L, 21L)))
  }

  test("partitioning-invariant (the trim semilattice property)") {
    assert(run(rows.repartition(7), 3) === run(rows.repartition(1), 3))
  }

  test("null scores and ids are skipped, not ranked") {
    val withNulls = Seq(
      (1L, Some(0.9), Some(10L)), (1L, None, Some(11L)), (1L, Some(0.8), None))
      .toDF("g", "cos", "id")
    assert(run(withNulls, 5) === Map(1L -> Seq(10L)))
  }
}
