package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** [[TextAnalysis.clusterTopicTerms]] — per-cluster lift ranking
  * replayed from the operator's own assignment, plus the lift
  * semantics on a constructed two-cluster corpus. */
class ClusterTopicSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def normalize(s: String): Array[String] =
    s.toLowerCase.replaceAll("[.,;:!?]", "").replaceAll(" +", " ").trim
      .split(" ").filter(_.nonEmpty)

  test("top-3 per cluster replays from the operator's own assignment") {
    val emb = graft.queries.Tables(spark, TestSpark.sfDir, "embeddings")
    val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
    val assign = Similarity.kmeansAssign(emb, "vec_id", "embedding", k = 4, sampleN = 16, iters = 2)
      .filter(col("centroid").isNotNull)
      .select(col("vec_id").as("doc_id"), col("centroid"))
    val byDoc = assign.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), normalize(r.getString(1))))
      .filter(r => byDoc.contains(r._1))
    val insts = texts.flatMap { case (id, ts) => ts.map(t => (byDoc(id), t)) }
    val nCt = insts.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nT = insts.groupBy(_._2).map { case (t, v) => t -> v.length.toLong }
    val want = nCt.keys.groupBy(_._1).toSeq.flatMap { case (c, keys) =>
      keys.toSeq
        .map { case (_, t) => (t, nCt((c, t)), nT(t), nCt((c, t)).toDouble / nT(t)) }
        .sortBy { case (t, _, _, s) => (-s, t) }.take(3).zipWithIndex
        .map { case ((t, ct, gt, s), i) => (c, t, ct, gt, s, i + 1) }
    }.toSet
    val got = TextAnalysis.clusterTopicTerms(assign, docs, "doc_id", "text", k = 3)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5))).toSet
    assert(got === want)
  }

  test("a token exclusive to one cluster tops that cluster with lift 1.0") {
    val docs = Seq(
      (1L, "alpha beta beta common"),
      (2L, "alpha common common"),
      (3L, "gamma gamma common"),
      (4L, "gamma common")).toDF("doc_id", "text")
    val assign = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1)).toDF("doc_id", "centroid")
    val got = TextAnalysis.clusterTopicTerms(assign, docs, "doc_id", "text", k = 1)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(4))).toSet
    assert(got === Set((0, "alpha", 1.0), (1, "gamma", 1.0)))
  }
}
