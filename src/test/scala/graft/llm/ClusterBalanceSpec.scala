package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** [[Sampling.clusterBalancedSample]] — per-cluster quota via the
  * trained quantizer + the smallest-md5 rule. The replay test
  * re-derives the within-cluster selection given the operator's own
  * assignment; the cap test pins the balancing semantics (a head
  * cluster is cut to quota, tail clusters keep everything). */
class ClusterBalanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private lazy val emb = graft.queries.Tables(spark, TestSpark.sfDir, "embeddings")

  test("selection = per-cluster smallest-md5 rank over the operator's own assignment") {
    val assign = Similarity.kmeansAssign(emb, "vec_id", "embedding", k = 4, sampleN = 16, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val want = assign.groupBy(_._2).toSeq.flatMap { case (c, rows) =>
      rows.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(5)
        .zipWithIndex.map { case (id, i) => (c, id, i + 1) }
    }.toSet
    val got = Sampling.clusterBalancedSample(emb, "vec_id", "embedding",
        quota = 5, k = 4, sampleN = 16, iters = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === want)
  }

  test("head clusters are capped at quota; clusters below quota keep all members") {
    val sizes = Similarity.kmeansAssign(emb, "vec_id", "embedding", k = 4, sampleN = 16, iters = 2)
      .groupBy("centroid").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val quota = 5
    val kept = Sampling.clusterBalancedSample(emb, "vec_id", "embedding",
        quota = quota, k = 4, sampleN = 16, iters = 2)
      .groupBy("centroid").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    sizes.foreach { case (c, n) =>
      assert(kept(c) === math.min(n, quota.toLong), s"cluster $c: n=$n kept=${kept(c)}")
    }
  }

  test("rows with unassignable vectors are excluded, not given a fake cluster") {
    val bad = Seq((9001L, Array(0.1f, 0.2f))) // wrong dimension vs the corpus codebook
      .toDF("vec_id", "embedding")
    val mixed = emb.select("vec_id", "embedding").unionByName(bad)
    val got = Sampling.clusterBalancedSample(mixed, "vec_id", "embedding",
        quota = 1000, k = 4, sampleN = 16, iters = 2)
      .filter(col("vec_id") === 9001L).count()
    assert(got === 0L)
  }
}
