package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** [[Retrieval.hardNegatives]] — mining trajectory replay plus the
  * margin rule's semantics on a constructed near-duplicate. */
class HardNegativesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = graft.queries.Tables(spark, TestSpark.sfDir, "embeddings")

  private def quant(v: Seq[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1000).toLong).toArray

  private def dot(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("mining replays in plain Scala: ranking, margin cut, re-rank") {
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> quant(r.getSeq[Float](1))).toMap
    val queries = vecs.keys.filter(_ < 10).toSeq.sorted
    val want = queries.flatMap { qid =>
      val scored = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, dot(vecs(qid), v)) }
        .sortBy { case (id, d) => (-d, id) }.take(21)
      val (posId, posDot) = scored.head
      scored.tail
        .filterNot { case (_, d) => posDot > 0 && d * 1000000L > posDot * 950000L }
        .take(5).zipWithIndex
        .map { case ((id, d), i) => (qid, id, i + 1, d, posId, posDot) }
    }.toSet
    val got = Retrieval.hardNegatives(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, candidateK = 20, marginPpm = 950000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === want)
  }

  test("an exact duplicate of the query becomes the positive; true negatives survive") {
    // corpus: query 100, its exact duplicate 101, a close-but-true
    // negative 102 (88% of the dup's score), a far negative 103
    val corpus = Seq(
      (100L, Array(1.0f, 0.0f, 0.5f)),
      (101L, Array(1.0f, 0.0f, 0.5f)),
      (102L, Array(0.9f, 0.1f, 0.4f)),
      (103L, Array(-1.0f, 0.2f, -0.5f))).toDF("vec_id", "embedding")
    val qdf = corpus.filter(col("vec_id") === 100L)
    // the exact duplicate outranks everything and BECOMES the positive
    // (the usual outcome when the corpus contains the query's twin);
    // 102 at 88% of its score clears the 95% margin and survives
    val strict = Retrieval.hardNegatives(corpus, qdf, "vec_id", "embedding",
        k = 3, candidateK = 3, marginPpm = 950000L)
      .select("neg_id").collect().map(_.getLong(0)).toSet
    assert(strict === Set(102L, 103L))
    val loose = Retrieval.hardNegatives(corpus, qdf, "vec_id", "embedding",
        k = 3, candidateK = 3, marginPpm = 1000000L)
      .select("neg_id").collect().map(_.getLong(0)).toSet
    assert(loose === Set(102L, 103L), "at 1e6 ppm only strictly-greater is cut")
  }

  test("margin cuts a near-tied second candidate when the positive is distinct") {
    // positive 201 (dot highest), near-dup-of-positive 202 at 99% of its
    // score, honest negative 203 — 202 must be excluded at 95% margin
    val corpus = Seq(
      (200L, Array(1.0f, 0.0f)),
      (201L, Array(2.0f, 0.0f)),
      (202L, Array(1.98f, 0.0f)),
      (203L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val qdf = corpus.filter(col("vec_id") === 200L)
    val got = Retrieval.hardNegatives(corpus, qdf, "vec_id", "embedding",
        k = 3, candidateK = 3, marginPpm = 950000L)
      .select("neg_id", "pos_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.forall(_._2 == 201L))
    assert(got.map(_._1).toSet === Set(203L), s"202 must be margin-cut: ${got.toSeq}")
  }

  test("underfill is visible: fewer surviving negatives return fewer rows") {
    val corpus = Seq(
      (300L, Array(1.0f, 0.0f)),
      (301L, Array(2.0f, 0.0f)),
      (302L, Array(1.99f, 0.0f))).toDF("vec_id", "embedding")
    val got = Retrieval.hardNegatives(corpus, corpus.filter(col("vec_id") === 300L),
        "vec_id", "embedding", k = 3, candidateK = 3, marginPpm = 950000L)
    assert(got.count() === 0L, "both candidates are within margin of the positive")
  }
}
