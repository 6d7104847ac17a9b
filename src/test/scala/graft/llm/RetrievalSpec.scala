package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Retrieval.bm25TopK]] — the quantized-integer BM25 ranker.
  *
  * The main test replays the ENTIRE integer formula in plain Scala over
  * a hand-built corpus and asserts bit-exact score equality — the same
  * replay discipline the DuckDB oracle applies at the catalog gate, but
  * with hand-checkable intermediate values (idf bit-lengths, the
  * milli-unit length norm) pinned in the fixture design. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // fixture: 8 docs, engineered df spread for the bit-length idf —
  //   apple  df=3 → 8 div 3 = 2 → idf2 = 1
  //   banana df=2 → 8 div 2 = 4 → idf2 = 2
  //   common df=8 → 8 div 8 = 1 → idf2 = 0  (ubiquitous ⇒ no signal)
  private val docs = Seq(
    0L -> "apple banana common",
    1L -> "apple apple apple common pad pad pad pad",
    2L -> "apple common",
    3L -> "banana common",
    4L -> "common pad",
    5L -> "common",
    6L -> "common pad pad",
    7L -> "common zebra")

  /** The quantized formula, re-derived independently in plain Scala. */
  private def expectedScores(qId: Long): Map[Long, Long] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
    val tf = toks.flatMap { case (id, ts) => ts.map(id -> _) }
      .groupBy(identity).map { case ((id, t), v) => (id, t) -> v.size.toLong }
    val dl = toks.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val n = docs.size.toLong
    val avgdlMilli = dl.values.sum * 1000 / n
    val df = tf.keys.groupBy(_._2).map { case (t, v) => t -> v.size.toLong }
    val qTerms = toks.toMap.apply(qId).distinct
    val perDoc = for {
      (id, _) <- docs if id != qId
      t <- qTerms if tf.contains((id, t))
    } yield {
      val idf2 = (63 - java.lang.Long.numberOfLeadingZeros(n / df(t))).toLong
      val tfv = tf((id, t))
      val dlnormMilli = dl(id) * 1000000 / avgdlMilli
      val denomMilli = tfv * 1000 + (1200 * (250 + (750 * dlnormMilli) / 1000)) / 1000
      id -> idf2 * tfv * 2200 * 1000 / denomMilli
    }
    perDoc.groupBy(_._1).map { case (id, v) => id -> v.map(_._2).sum }
  }

  private def run(k: Int): Map[Long, Long] = {
    val df = docs.toDF("doc_id", "text")
    Retrieval.bm25TopK(df, df.filter($"doc_id" === 0L),
        "doc_id", "text", "doc_id", "text", k = k, excludeSelf = true)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
  }

  test("bm25TopK: scores are bit-identical to an independent integer replay") {
    val got = run(k = 10)
    assert(got == expectedScores(0L), s"got $got, want ${expectedScores(0L)}")
  }

  test("bm25TopK: ubiquitous terms score zero, rarer term outranks commoner at equal length") {
    val got = run(k = 10)
    // doc 5 contains ONLY the ubiquitous term: a candidate, but score 0
    assert(got(5L) == 0L)
    // docs 2 and 3 have identical length and tf=1; banana (idf2=2)
    // must outrank apple (idf2=1)
    assert(got(3L) > got(2L))
    // the self doc is excluded before ranking, not merely dropped after
    assert(!got.contains(0L))
    // every non-self doc shares "common", so all 7 are candidates —
    // those sharing ONLY the zero-idf term score exactly 0
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L) && got(7L) == 0L)
  }

  // 2-d embeddings for the hybrid stage: query 0 points along +x;
  // doc 2 aligns with it, doc 3 (the bm25 winner) points away — so the
  // semantic re-rank must INVERT the lexical order of docs 2 and 3
  private val embs = Seq(
    0L -> Array(1.0f, 0.0f),
    1L -> Array(0.0f, 1.0f),
    2L -> Array(0.8f, 0.6f),
    3L -> Array(-0.6f, 0.8f),
    4L -> Array(0.6f, -0.8f),
    5L -> Array(-1.0f, 0.0f),
    6L -> Array(0.0f, -1.0f),
    7L -> Array(0.28f, 0.96f))

  private def runHybrid(candidateK: Int, k: Int): Seq[(Long, Long, Long, Long)] = {
    val df = docs.toDF("doc_id", "text")
    val ev = embs.toDF("vec_id", "embedding")
    Retrieval.hybridRerank(df, df.filter($"doc_id" === 0L), ev,
        "doc_id", "text", "doc_id", "text", "vec_id", "embedding",
        candidateK = candidateK, k = k, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
  }

  test("hybridRerank: dot_q is the exact quantized integer dot; re-rank inverts lexical order") {
    val got = runHybrid(candidateK = 7, k = 7)
    val dots = got.map(r => r._2 -> r._4).toMap
    // independent replay: quantize exactly as the operator does
    val em = embs.toMap
    def qdot(a: Long, b: Long): Long =
      em(a).zip(em(b)).map { case (x, y) =>
        math.floor(x.toDouble * 1000).toLong * math.floor(y.toDouble * 1000).toLong }.sum
    for ((id, d) <- dots) assert(d == qdot(0L, id), s"doc $id: got $d, want ${qdot(0L, id)}")
    // bm25 alone ranks doc 3 above doc 2 (rarer term); the embedding
    // stage must flip them (doc 2 aligns with the query, doc 3 opposes)
    val bm25 = run(k = 10)
    assert(bm25(3L) > bm25(2L))
    assert(dots(2L) > dots(3L))
    val order = got.sortBy(r => (-r._4, r._2)).map(_._2)
    assert(order.indexOf(2L) < order.indexOf(3L))
    // bm25 scores ride through unchanged
    assert(got.map(r => r._2 -> r._3).toMap.forall { case (id, s) => s == bm25(id) })
  }

  test("hybridRerank: candidateK gates stage 2 — a semantic winner outside the lexical top-k never appears") {
    val bm25 = run(k = 10)
    val lexBest = bm25.toSeq.sortBy { case (id, s) => (-s, id) }.head._1
    val one = runHybrid(candidateK = 1, k = 1)
    assert(one.map(_._2) == Seq(lexBest),
      s"with candidateK=1 only the lexical best ($lexBest) may survive, got $one")
  }

  test("rrfFuse: exact ppm contributions, agreement outranks single-list, n_lists witnesses") {
    val lex = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((0L, 12L, 1), (0L, 13L, 2), (0L, 11L, 3))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(lex, dense), k = 10)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    def c(rank: Int): Long = 1000000L / (60 + rank)
    // independent integer replay of every fused score
    assert(got == Map(
      10L -> ((c(1), 1L)),
      11L -> ((c(2) + c(3), 2L)),
      12L -> ((c(3) + c(1), 2L)),
      13L -> ((c(2), 1L))))
    // both two-list docs outrank both one-list docs here — agreement wins
    assert(got(11L)._1 > got(10L)._1 && got(12L)._1 > got(10L)._1)
    // k truncates after fusion: top-2 must be exactly the two-list docs
    val top2 = Retrieval.rrfFuse(Seq(lex, dense), k = 2)
      .collect().map(_.getLong(1)).toSet
    assert(top2 == Set(11L, 12L))
  }

  test("bm25TopK maxDfPpm: head terms cut before candidacy; all-stopword queries return nothing") {
    val df = docs.toDF("doc_id", "text")
    def run(ppm: Int): Map[Long, Long] =
      Retrieval.bm25TopK(df, df.filter($"doc_id" === 0L),
          "doc_id", "text", "doc_id", "text", k = 10, excludeSelf = true,
          maxDfPpm = ppm)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val full = run(1000000)
    assert(Set(1L, 2L, 3L).subsetOf(full.keySet), s"sanity — apple+banana docs rank: $full")
    // 300000 ppm keeps banana (df 2/8 = 250000) and cuts apple (375000)
    // and common (1000000): only the banana doc may remain a candidate
    val capped = run(300000)
    assert(capped.keySet == Set(3L), s"apple docs must be gone: $capped")
    // the cut changes candidacy, never surviving terms' arithmetic
    // (common contributes idf2 = 0 in the full run, so doc 3 is equal)
    assert(capped(3L) == full(3L), "surviving terms' scores must be unchanged by the cut")
    assert(run(100000).isEmpty,
      "a query whose every term is over the ceiling returns no rows (Lucene all-stopwords)")
  }

  test("bm25TopK: k bounds the per-query rows; ties break by ascending doc id") {
    val top2 = run(k = 2)
    assert(top2.size == 2)
    val all = run(k = 10)
    val bestTwo = all.toSeq.sortBy { case (id, s) => (-s, id) }.take(2).toMap
    assert(top2 == bestTwo)
  }
}
