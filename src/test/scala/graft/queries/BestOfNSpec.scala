package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Best-of-N selection (rejection-sampling prep): plain-Scala replay of
  * the rotation candidates, the per-(word, position) reward rollup, the
  * lowest-j tie-break, and the winning text's md5; plus the no-shuffle
  * plan pin (one narrow map — the sft_examples profile). */
class BestOfNSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private def norm(s: String): Array[String] =
    s.toLowerCase.replaceAll("[.,;:!?]", "").replaceAll(" +", " ").trim
      .split(" ", -1).filter(_.nonEmpty)

  private def reward(c: Seq[String]): Long =
    c.zipWithIndex.map { case (w, i) => h60(s"rm:$w:${i + 1}") % 1000 }.sum

  test("selection replays in plain Scala: rotations, rewards, argmax with lowest-j ties, winner md5") {
    val texts = Tables(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text").collect()
      .filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = LlmQueries.bestOfNSelect(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got.size === texts.size)
    texts.foreach { case (id, text) =>
      val ws = norm(text)
      val rw = ws.drop(ws.length / 3).toSeq
      val cands = (0 until 4).map { j =>
        val jm = if (rw.isEmpty) 0 else j % rw.length
        val c = rw.drop(jm) ++ rw.take(jm)
        (j, reward(c), c)
      }
      val (bj, br, bc) = cands.minBy { case (j, r, _) => (-r, j) }
      val (gj, gr, gsum, gmd5) = got(id)
      assert((gj, gr) === ((bj, br)), s"doc $id selection")
      assert(gsum === cands.map(_._2).sum, s"doc $id reward mass")
      assert(gmd5 === md5hex(bc.mkString(" ")), s"doc $id winner md5")
    }
  }

  test("tie-break: identical candidates (short responses) resolve to the lowest j") {
    // a 1-word response makes all four rotations identical — the
    // selector must report j = 0, never an arbitrary survivor
    import spark.implicits._
    val one = Seq((1L, "aa bb cc")).toDF("doc_id", "text") // resp = [bb, cc] -> rotations j=0/2 equal, j=1/3 equal
    val tmp = java.nio.file.Files.createTempDirectory("bon").toString
    one.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // reuse the fixture tables for the other parquet names is not
    // needed — the gate only reads documents
    val r = LlmQueries.bestOfNSelect(spark, tmp).head()
    assert(Set(0, 1).contains(r.getInt(1)), "winner must be the lowest j of its reward class")
    val rw = Seq("bb", "cc")
    val exp = (0 until 4).map { j =>
      val jm = j % 2; val c = rw.drop(jm) ++ rw.take(jm); (j, reward(c))
    }.minBy { case (j, rr) => (-rr, j) }
    assert(r.getInt(1) === exp._1 && r.getLong(2) === exp._2)
  }

  test("plan: one narrow map, no shuffle") {
    val df = LlmQueries.bestOfNSelect(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the only exchange allowed is the final orderBy's range partition
    assert(!plan.contains("Exchange hashpartitioning"),
      s"selection must be row-local:\n$plan")
  }
}
