package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Retrieval.mmrTopK]] — Maximal Marginal Relevance. The main test
  * replays the greedy trajectory in plain Scala (integer dots, the
  * λ·rel − (1−λ)·maxSim marginal, id tie-breaks); the λ=1000 test pins
  * the pure-relevance degenerate case to a plain top-k; the near-dup
  * fixture checks the diversification semantics the operator exists
  * for (plain top-k returns both copies, MMR does not). */
class MmrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def quant(v: Array[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1000.0).toLong)

  private def dot(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  /** Independent greedy replay over one query's candidate pool. */
  private def replay(qv: Array[Float], cands: Seq[(Long, Array[Float])],
      candidateK: Int, k: Int, lam: Long): Seq[(Long, Int, Long, Option[Long])] = {
    val q = quant(qv)
    val pool = cands.map { case (id, v) => (id, quant(v)) }
      .map { case (id, cv) => (id, cv, dot(q, cv)) }
      .sortBy { case (id, _, rel) => (-rel, id) }.take(candidateK)
    var picked = Vector.empty[(Long, Int, Long, Option[Long])]
    var selected = Vector.empty[Array[Long]]
    var remaining = pool
    var step = 1
    while (step <= math.min(k, pool.length)) {
      val scoredRem = remaining.map { case (id, cv, rel) =>
        val ms = if (selected.isEmpty) None else Some(selected.map(dot(cv, _)).max)
        val s = if (step == 1) rel else lam * rel - (1000L - lam) * ms.get
        (id, cv, rel, ms, s)
      }
      val (id, cv, rel, ms, _) = scoredRem.minBy { case (i, _, _, _, s) => (-s, i) }
      picked = picked :+ ((id, step, rel, if (step == 1) None else ms))
      selected = selected :+ cv
      remaining = remaining.filterNot(_._1 == id)
      step += 1
    }
    picked
  }

  private val query: (Long, Array[Float]) = 100L -> Array(1.0f, 0.2f, 0.1f)
  // relevance order: 1 (near query), 2 (its near-dup), 3, 4, 5 spread out
  private val corpus: Seq[(Long, Array[Float])] = Seq(
    1L -> Array(0.95f, 0.2f, 0.15f),
    2L -> Array(0.94f, 0.21f, 0.14f), // near-duplicate of 1
    3L -> Array(0.6f, 0.7f, 0.0f),
    4L -> Array(0.5f, -0.5f, 0.6f),
    5L -> Array(0.1f, 0.1f, -0.9f))

  private def run(lam: Int, k: Int = 3, candidateK: Int = 5) =
    Retrieval.mmrTopK(corpus.toDF("vec_id", "embedding"),
        Seq(query).toDF("vec_id", "embedding"), "vec_id", "embedding",
        candidateK = candidateK, k = k, lambdaMilli = lam)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
      .sortBy(_._2)

  test("matches the plain-Scala greedy replay exactly") {
    for (lam <- Seq(0, 300, 700, 1000)) {
      val got = run(lam)
      val want = replay(query._2, corpus, candidateK = 5, k = 3, lam = lam.toLong)
      assert(got === want, s"lambdaMilli=$lam")
    }
  }

  test("lambda=1000 degenerates to the plain relevance top-k") {
    val got = run(1000).map(_._1)
    val rel = corpus.map { case (id, v) => id -> dot(quant(query._2), quant(v)) }
      .sortBy { case (id, r) => (-r, id) }.map(_._1).take(3)
    assert(got === rel)
  }

  test("near-duplicate top hits: plain top-2 keeps both, MMR drops one") {
    val plain = run(1000, k = 2).map(_._1).toSet
    assert(plain === Set(1L, 2L), "fixture: the two near-dups must lead on relevance")
    val mmr = run(500, k = 2).map(_._1).toSet
    assert(mmr.contains(1L) && !mmr.contains(2L),
      s"MMR must keep one copy and diversify, got $mmr")
  }

  test("max_sim witness: rank 1 null, later ranks carry the real max dot") {
    val got = run(700, k = 3)
    assert(got.head._4.isEmpty)
    assert(got.tail.forall(_._4.nonEmpty))
  }

  test("multiple queries run independently in one call") {
    val q2: (Long, Array[Float]) = 200L -> Array(0.0f, 0.0f, -1.0f)
    val got = Retrieval.mmrTopK(corpus.toDF("vec_id", "embedding"),
        Seq(query, q2).toDF("vec_id", "embedding"), "vec_id", "embedding",
        candidateK = 5, k = 2, lambdaMilli = 700)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1)))
    assert(got.count(_._1 == 100L) === 2 && got.count(_._1 == 200L) === 2)
    // q2 points at doc 5's direction: its rank-1 pick must be doc 5
    assert(got.find(r => r._1 == 200L && r._2 == 1).get._3 === 5L)
  }
}
