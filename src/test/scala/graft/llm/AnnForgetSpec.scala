package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.LlmQueries

/** Delete path for the persisted IVF index (`ann_ivf_forget`): the
  * tombstone mask must (a) never surface a deleted id, (b) genuinely
  * re-rank the queries whose top-5 contained one, (c) leave every
  * other query's results bit-identical, and (d) add ZERO hash
  * exchanges over the plain persisted probe — the mask is a broadcast
  * anti-join, never an index rewrite. */
class AnnForgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private def results(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Int)]] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(t => (t._2, t._3)).toSeq).toMap

  test("deleted ids never surface; affected queries re-rank, untouched queries are bit-identical") {
    val deletes = graft.queries.Tables(spark, TestSpark.sfDir, "embeddings")
      .select("vec_id").collect().map(_.getLong(0))
      .filter(id => h60(s"forget:$id") % 50 == 0).toSet
    assert(deletes.nonEmpty, "fixture must plant delete requests")
    val base = results(LlmQueries.annIvfPersisted(spark, TestSpark.sfDir))
    val forg = results(LlmQueries.annIvfForget(spark, TestSpark.sfDir))
    forg.values.flatten.foreach { case (cid, _) =>
      assert(!deletes.contains(cid), s"deleted vector $cid surfaced in the probe")
    }
    val affected = base.filter(_._2.exists(r => deletes.contains(r._1))).keySet
    assert(affected.nonEmpty,
      "fixture must delete at least one in-top-5 neighbor or the gate proves nothing")
    affected.foreach { q =>
      assert(forg(q) !== base(q), s"query $q lost a neighbor and must re-rank")
      val keptBase = base(q).map(_._1).filterNot(deletes.contains)
      assert(forg(q).map(_._1).take(keptBase.length) === keptBase,
        s"query $q: surviving neighbors must keep their relative order")
    }
    (base.keySet -- affected).foreach { q =>
      assert(forg(q) === base(q), s"query $q had no deleted neighbor and must not change")
    }
  }

  test("plan: the mask is a broadcast anti-join; zero hash exchanges added over the plain probe") {
    val pBase = LlmQueries.annIvfPersisted(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    val pForg = LlmQueries.annIvfForget(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(pForg.contains("LeftAnti"), s"delete mask must be an anti-join:\n$pForg")
    assert(pForg.contains("Bucketed: true"),
      s"the probe must still read the bucketed index:\n$pForg")
    def hashEx(p: String): Int = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx(pForg) === hashEx(pBase),
      s"the delete path must add no shuffle (base ${hashEx(pBase)}, forget ${hashEx(pForg)})")
  }
}
