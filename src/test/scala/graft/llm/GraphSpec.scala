package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Graph.pageRankPpm]] / [[Graph.keepCentral]] — integer fixed-point
  * PageRank on the pair graph. The main test replays all eight rounds
  * in plain Scala (truncating division included) and asserts the exact
  * trajectory endpoint; the star fixture checks the centrality
  * semantics the operator exists for. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Synchronous integer rounds, re-derived independently. */
  private def replay(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var r = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = r.keys.map(v => v -> (150000L + 850000L * in(v) / 1000000L)).toMap
    }
    r
  }

  // a triangle (0,1,2) bridged to a path tail (2-3, 3-4): asymmetric
  // degrees make every node's trajectory distinct
  private val pairs = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L))

  test("pageRankPpm matches the plain-Scala eight-round replay exactly") {
    val got = Graph.pageRankPpm(pairs.toDF("id_a", "id_b"), iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === replay(pairs, 8))
  }

  test("star center out-ranks its leaves; keepCentral picks it") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val ranks = Graph.pageRankPpm(star.toDF("id_a", "id_b"), iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(l => ranks(0L) > ranks(l)),
      s"center must dominate: $ranks")
    val kept = Graph.keepCentral(star.toDF("id_a", "id_b"), iters = 8).collect()
    assert(kept.length === 1 && kept(0).getLong(1) === 0L)
  }

  test("two components keep one representative each, ties break by id") {
    // component {10, 11} is a symmetric pair — identical ranks, so the
    // tie-break must pick 10; component {20, 21, 22} is a path whose
    // middle node dominates
    val g = Seq((10L, 11L), (20L, 21L), (21L, 22L))
    val kept = Graph.keepCentral(g.toDF("id_a", "id_b"), iters = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(kept === Map(10L -> 10L, 20L -> 21L))
  }

  test("rank mass arithmetic never overflows under the LSH degree cap") {
    // worst inbound sum at the documented bound: deg 10^7 neighbors of
    // rank ~10^6 each — damping * s must stay inside Long
    val s = BigInt(10000000L) * 1000000L
    assert(BigInt(850000L) * s < BigInt(Long.MaxValue))
  }
}
