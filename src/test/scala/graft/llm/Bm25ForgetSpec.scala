package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.LlmQueries

/** Delete path for the persisted BM25 index (`bm25_topk_forget`):
  * the tombstone mask must (a) never surface a deleted doc, (b) keep
  * every surviving (query, doc) score BIT-IDENTICAL to the unmasked
  * probe — the stale-stats contract: deletes mask candidates, they do
  * not re-score the corpus — (c) never evict a surviving top-10 member
  * (removing a competitor only promotes), and (d) add zero hash
  * exchanges over the plain persisted probe. */
class Bm25ForgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private def rows(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("deleted docs never surface; surviving scores bit-identical; survivors never evicted") {
    val deletes = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
      .filter(id => h60(s"forget:$id") % 50 == 0).toSet
    val base = rows(LlmQueries.bm25TopkPersisted(spark, TestSpark.sfDir))
    val forg = rows(LlmQueries.bm25TopkForget(spark, TestSpark.sfDir))
    assert(forg.keys.forall { case (_, d) => !deletes.contains(d) },
      "a deleted doc surfaced in the masked probe")
    val affected = base.keys.filter { case (_, d) => deletes.contains(d) }.map(_._1).toSet
    assert(affected.nonEmpty,
      "fixture must delete at least one in-top-10 doc or the gate proves nothing")
    // stale stats: every pair present in both reads the same score
    (base.keySet intersect forg.keySet).foreach { k =>
      assert(base(k) === forg(k), s"pair $k re-scored — stats must stay stale")
    }
    // survivors are never evicted: masking a competitor only promotes
    base.keys.filterNot { case (_, d) => deletes.contains(d) }.foreach { k =>
      assert(forg.contains(k), s"surviving pair $k evicted by the mask")
    }
    // affected queries gained at least the freed slots' worth of change
    affected.foreach { q =>
      assert(forg.keys.count(_._1 == q) >= base.keys.count(_._1 == q) -
        base.keys.count { case (qq, d) => qq == q && deletes.contains(d) },
        s"query $q lost more rows than its deleted neighbors")
    }
  }

  test("plan: broadcast anti-join mask; zero hash exchanges added over the plain probe") {
    val pBase = LlmQueries.bm25TopkPersisted(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    val pForg = LlmQueries.bm25TopkForget(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(pForg.contains("LeftAnti"), s"delete mask must be an anti-join:\n$pForg")
    def hashEx(p: String): Int = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx(pForg) === hashEx(pBase),
      s"the delete path must add no shuffle (base ${hashEx(pBase)}, forget ${hashEx(pForg)})")
  }
}
