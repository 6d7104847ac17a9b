package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Restart contract for the streaming image dedup: the distinct-
  * fingerprint state (`dropDuplicates(sig)`) must survive a reopened
  * checkpoint — a re-ingested duplicate of PRE-restart content never
  * passes the door twice. */
class StreamMediaRestartSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshRoot(tag: String): java.io.File = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_rst_$tag").toFile
    sys.addShutdownHook { def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }; rm(root) }
    root
  }

  test("stream_media_dedup: seen fingerprints survive the restart — re-ingested dups never pass") {
    val root = freshRoot("mdedup")
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    val cp = new java.io.File(root, "cp").toString
    // params frames (doc_id, p, nx, ny) — cluster 0 for ids 0..7
    def paramFile(name: String, ids: Seq[Long]): Unit = {
      val s = spark
      import s.implicits._
      val stage = new java.io.File(root, s"stage_$name")
      ids.map(id => (id, id / 8, id % 8, (id / 8) % 8)).toDF("doc_id", "p", "nx", "ny")
        .coalesce(1).write.parquet(stage.toString)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(srcDir, s"$name.parquet").toPath)
      ()
    }
    def run(): Seq[String] = {
      val schema = spark.read.parquet(srcDir.listFiles().head.toString).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString + "/*.parquet")
      val dedup = LlmQueries.mediaSigsFor(src)
        .dropDuplicates("sig").select("sig")
      val got = scala.collection.mutable.ArrayBuffer.empty[String]
      val q = dedup.writeStream.option("checkpointLocation", cp)
        .outputMode("append")
        .foreachBatch { (df: DataFrame, _: Long) =>
          got.synchronized { got ++= df.collect().map(_.getString(0)) }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      got.toSeq
    }
    paramFile("a", Seq(1L, 2L, 3L))
    val first = run()
    assert(first.distinct.size === first.size && first.nonEmpty)

    // run 2 re-ingests doc 2's EXACT image (same params under a new
    // id ⇒ identical pixels ⇒ identical sig) plus one genuinely new
    // image; the reopened state must swallow the duplicate
    val s2 = spark
    import s2.implicits._
    val stage = new java.io.File(root, "stage_b")
    Seq((99L, 0L, 2L, 0L), (200L, 25L, 0L, 1L)).toDF("doc_id", "p", "nx", "ny")
      .coalesce(1).write.parquet(stage.toString)
    java.nio.file.Files.move(
      stage.listFiles().filter(_.getName.endsWith(".parquet")).head.toPath,
      new java.io.File(srcDir, "b.parquet").toPath)
    val second = run()
    assert(second.size === 1,
      s"only the genuinely-new fingerprint may pass the reopened state: $second")
    assert(!first.contains(second.head))
  }

}
