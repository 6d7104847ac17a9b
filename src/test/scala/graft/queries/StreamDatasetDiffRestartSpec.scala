package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Restart contract for the ingest-side snapshot diff
  * ([[StreamingQueries.diffAgainst]] — the transform
  * `stream_dataset_diff` ships): a document RE-DELIVERED across a
  * reopened checkpoint keeps its FIRST status — the keep-first dedup
  * state survives the restart, so an at-least-once source cannot make
  * the diff contradict itself (the verdict a retrain decision already
  * consumed is immutable), even when the redelivery carries DIFFERENT
  * bytes. Brings the diff stream up to the forget stream's restart
  * discipline (StreamForgetRestartSpec). */
class StreamDatasetDiffRestartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("stream_dataset_diff: a doc redelivered after a restart keeps its first status") {
    val root = java.nio.file.Files.createTempDirectory("graft_rst_diff").toFile
    sys.addShutdownHook { def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }; rm(root) }
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    val cp = new java.io.File(root, "cp").toString
    val s = spark
    import s.implicits._

    // the persisted reference snapshot: docs 1 (text "old") and 2
    val snap = Seq((1L, md5hex("old")), (2L, md5hex("two")))
      .toDF("doc_id", "a_md5")
    snap.write.mode("overwrite").parquet(s"${root}/snap")
    val snapT = spark.read.parquet(s"${root}/snap")

    def deliver(name: String, rows: Seq[(Long, String)]): Unit = {
      val stage = new java.io.File(root, s"stage_$name")
      rows.toDF("doc_id", "b_md5").coalesce(1).write.parquet(stage.toString)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(srcDir, s"$name.parquet").toPath)
      ()
    }
    def run(): Seq[(Long, String, Option[String])] = {
      val schema = spark.read.parquet(srcDir.listFiles().head.toString).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString + "/*.parquet")
      val out = StreamingQueries.diffAgainst(snapT, src.toDF())
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Option[String])]
      val q = out.writeStream.option("checkpointLocation", cp)
        .outputMode("append")
        .foreachBatch { (df: DataFrame, _: Long) =>
          got.synchronized {
            got ++= df.collect().map(r =>
              (r.getLong(0), r.getString(1), Option(r.getString(3))))
          }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      got.toSeq.sortBy(_._1)
    }

    // run 1: doc 1 arrives changed (new bytes), doc 3 arrives added
    deliver("a", Seq((1L, md5hex("new")), (3L, md5hex("three"))))
    assert(run() === Seq(
      (1L, "changed", Some(md5hex("new"))),
      (3L, "added", Some(md5hex("three")))))

    // run 2 (reopened checkpoint): doc 1 is REDELIVERED — now with the
    // snapshot's own bytes, which a stateless probe would re-emit as a
    // contradicting 'unchanged' row; keep-first must swallow it. Doc 2
    // arrives for the first time and must still flow.
    deliver("b", Seq((1L, md5hex("old")), (2L, md5hex("two"))))
    assert(run() === Seq((2L, "unchanged", Some(md5hex("two")))),
      "the redelivered doc must keep its first status (no second emission)")
  }
}
