package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Restart contract for the streaming video dedup — the last cell of
  * the modality × lifecycle matrix: the distinct-majority-signature
  * state (`dropDuplicates(sig)`) must survive a reopened checkpoint.
  * The duplicate model is REDELIVERY (at-least-once ingest): identical
  * (id, cluster) params synthesize an identical 5-frame GIF, so the
  * majority signature is bit-identical and the reopened state must
  * swallow it, while a genuinely new cluster's video passes. */
class StreamVideoRestartSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshRoot(tag: String): java.io.File = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_rst_$tag").toFile
    sys.addShutdownHook { def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }; rm(root) }
    root
  }

  test("stream_video_dedup: seen fingerprints survive the restart — redelivered video never passes") {
    val root = freshRoot("vdedup")
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    val cp = new java.io.File(root, "cp").toString
    def paramFile(name: String, rows: Seq[(Long, Long)]): Unit = {
      val s = spark
      import s.implicits._
      val stage = new java.io.File(root, s"stage_$name")
      rows.toDF("doc_id", "p").coalesce(1).write.parquet(stage.toString)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(srcDir, s"$name.parquet").toPath)
      ()
    }
    def run(): Seq[String] = {
      val schema = spark.read.parquet(srcDir.listFiles().head.toString).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString + "/*.parquet")
      val dedup = LlmQueries.videoSigsForParams(src)
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
    paramFile("a", Seq((41L, 5L), (42L, 5L), (43L, 5L)))
    val first = run()
    assert(first.distinct.size === first.size && first.nonEmpty)

    // run 2 redelivers doc 42 verbatim (identical GIF ⇒ identical
    // majority signature) plus one genuinely new cluster; the reopened
    // state must swallow the redelivery
    paramFile("b", Seq((42L, 5L), (900L, 112L)))
    val second = run()
    assert(second.size === 1,
      s"only the genuinely-new fingerprint may pass the reopened state: $second")
    assert(!first.contains(second.head))
  }
}
