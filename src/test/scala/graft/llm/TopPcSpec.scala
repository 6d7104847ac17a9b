package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Similarity.topPrincipalComponent]] — plain-Scala trajectory
  * replay, normalization invariants, and alignment on a planted
  * dominant direction. */
class TopPcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = graft.queries.Tables(spark, TestSpark.sfDir, "embeddings")

  private def replay(vecs: Seq[Array[Long]], iters: Int): (Array[BigInt], Long) = {
    val d = vecs.head.length
    val n = BigInt(vecs.length)
    val sx = Array.tabulate(d)(i => vecs.map(v => BigInt(v(i))).sum)
    val c = Array.tabulate(d, d)((i, j) =>
      n * vecs.map(v => BigInt(v(i)) * BigInt(v(j))).sum - sx(i) * sx(j))
    val scale = BigInt(1000000)
    var v = Array.fill(d)(scale)
    (1 to iters).foreach { _ =>
      val w = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
      val mx = w.map(_.abs).max
      v = if (mx == 0) w else w.map(x => x * scale / mx)
    }
    val num = (for (i <- 0 until d; j <- 0 until d) yield v(i) * c(i)(j) * v(j)).sum
    val den = v.map(x => x * x).sum * (0 until d).map(i => c(i)(i)).sum
    (v, if (den == 0) 0L else (num * scale / den).toLong)
  }

  test("the whole trajectory replays in plain Scala from the raw vectors") {
    val vecs = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 1000).toLong).toArray).toSeq
    val (v, ray) = replay(vecs, 8)
    val got = Similarity.topPrincipalComponent(emb, "embedding", iters = 8)
      .orderBy("i").collect()
    assert(got.map(_.getLong(1)).toSeq === v.map(_.toLong).toSeq)
    assert(got.head.getLong(2) === ray)
  }

  test("output is max-abs normalized and the variance fraction is a valid ppm") {
    val got = Similarity.topPrincipalComponent(emb, "embedding", iters = 8).collect()
    val pcs = got.map(_.getLong(1))
    assert(pcs.map(math.abs).max === 1000000L, "max-abs normalization")
    val ray = got.head.getLong(2)
    assert(ray >= 0L && ray <= 1000000L, s"rayleigh_ppm out of range: $ray")
  }

  test("a planted dominant direction is recovered") {
    // variance concentrated on dim 1: x1 ~ ±1.0, dims 0/2 tiny jitter
    val vecs = (0 until 40).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array(0.001f * (i % 3), s, 0.002f * (i % 2)))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.topPrincipalComponent(df, "embedding", iters = 8)
      .orderBy("i").collect().map(_.getLong(1))
    assert(math.abs(got(1)) === 1000000L, s"dominant dim must carry the PC: ${got.toSeq}")
    assert(math.abs(got(0)) < 100000L && math.abs(got(2)) < 100000L,
      s"noise dims must stay small: ${got.toSeq}")
    val ray = Similarity.topPrincipalComponent(df, "embedding", iters = 8)
      .collect().head.getLong(2)
    assert(ray > 900000L, s"one direction explains ~all variance: $ray")
  }
}
