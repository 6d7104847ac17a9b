package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** [[Similarity.int8QuantizeReport]] — plain-Scala replay, the
  * truncation-error bound, the zero-dim guard, and a measured
  * retrieval-agreement property of the int8 scheme itself. */
class Int8QuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = graft.queries.Tables(spark, TestSpark.sfDir, "embeddings")

  private lazy val vecs: Map[Long, Array[Long]] =
    emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000).toLong).toArray).toMap

  private lazy val got =
    Similarity.int8QuantizeReport(emb, "embedding").orderBy("i").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))

  test("per-dim report replays in plain Scala") {
    val d = vecs.values.head.length
    val want = (0 until d).map { i =>
      val col = vecs.values.map(_(i)).toSeq
      val amax = col.map(math.abs).max
      val codes = col.map(q => if (amax == 0) 0L else q * 127 / amax)
      val errs = col.zip(codes).map { case (q, c) => math.abs(q * 127 - c * amax) }
      (i, amax, col.length.toLong, errs.sum, errs.max, codes.map(math.abs).sum)
    }
    assert(got.toSeq === want)
  }

  test("codes are int8-representable and truncation error < one grid step") {
    got.foreach { case (i, amax, _, _, maxErr, _) =>
      // |q*127 - code*amax| < amax for every element (div remainder bound)
      if (amax > 0) assert(maxErr < amax, s"dim $i: err $maxErr >= amax $amax")
      else assert(maxErr === 0L)
    }
    val d = vecs.values.head.length
    (0 until d).foreach { i =>
      val amax = got(i)._2
      vecs.values.foreach { v =>
        val code = if (amax == 0) 0L else v(i) * 127 / amax
        assert(code >= -127 && code <= 127)
      }
    }
  }

  test("an all-zero dimension reports amax=0 with zero codes and zero error") {
    val df = Seq(
      (1L, Array(0.5f, 0.0f, -0.25f)),
      (2L, Array(-0.5f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val rows = Similarity.int8QuantizeReport(df, "embedding")
      .orderBy("i").collect()
    val z = rows(1)
    assert(z.getLong(1) === 0L) // amax_milli
    assert(z.getLong(3) === 0L && z.getLong(5) === 0L) // errors, codes
  }

  test("int8TopK replays exactly: same scales, same codes, same ranking") {
    val amax = got.map(_._2)
    def codes(v: Array[Long]): Array[Long] =
      v.indices.map(i => if (amax(i) == 0) 0L else v(i) * 127 / amax(i)).toArray
    val coded = vecs.map { case (id, v) => id -> codes(v) }
    val want = coded.keys.filter(_ < 10).toSeq.flatMap { qid =>
      coded.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, coded(qid).zip(v).map { case (a, b) => a * b }.sum) }
        .sortBy { case (id, d) => (-d, id) }.take(5).zipWithIndex
        .map { case ((id, d), r) => (qid, id, r + 1, d) }
    }.toSet
    val got2 = Similarity.int8TopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
      .select("query_id", "corpus_id", "rank", "dot8")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(got2 === want)
  }

  test("int8-dot retrieval agrees with exact-dot retrieval on most of top-5") {
    val amax = got.map(_._2)
    def codes(v: Array[Long]): Array[Long] =
      v.indices.map(i => if (amax(i) == 0) 0L else v(i) * 127 / amax(i)).toArray
    val coded = vecs.map { case (id, v) => id -> codes(v) }
    def top5(m: Map[Long, Array[Long]], qid: Long): Set[Long] =
      m.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, m(qid).zip(v).map { case (a, b) => a * b }.sum) }
        .sortBy { case (id, d) => (-d, id) }.take(5).map(_._1).toSet
    val queries = vecs.keys.filter(_ < 10).toSeq
    val overlap = queries.map { q =>
      (top5(vecs, q) intersect top5(coded, q)).size
    }.sum.toDouble / (queries.size * 5)
    assert(overlap >= 0.6, s"int8 top-5 agreement too low: $overlap")
  }
}
