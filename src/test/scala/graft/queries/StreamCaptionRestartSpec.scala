package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Restart contract for the streaming cross-modal dedup: the distinct
  * (caption-fingerprint, image-fingerprint) key-pair state
  * (`dropDuplicates(tsig_md5, isig)`) must survive a reopened
  * checkpoint. Redelivery model: identical (id, cluster, noise) params
  * synthesize an identical caption AND an identical BMP, so both keys
  * collide and the reopened state must swallow the pair, while a
  * genuinely new cluster's pair passes. */
class StreamCaptionRestartSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshRoot(tag: String): java.io.File = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_rst_$tag").toFile
    sys.addShutdownHook { def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }; rm(root) }
    root
  }

  test("stream_caption_dedup: seen key pairs survive the restart — a re-posted pair never passes") {
    val root = freshRoot("capdedup")
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    val cp = new java.io.File(root, "cp").toString
    def paramFile(name: String, ids: Seq[Long]): Unit = {
      val s = spark
      import s.implicits._
      val stage = new java.io.File(root, s"stage_$name")
      ids.map(d => (d, d / 8, d % 8, (d / 8) % 8)).toDF("doc_id", "p", "nx", "ny")
        .coalesce(1).write.parquet(stage.toString)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(srcDir, s"$name.parquet").toPath)
      ()
    }
    def run(): Seq[(String, String)] = {
      val schema = spark.read.parquet(srcDir.listFiles().head.toString).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString + "/*.parquet")
      val dedup = LlmQueries.captionStreamKeys(src)
        .dropDuplicates("tsig_md5", "isig")
      val got = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val q = dedup.writeStream.option("checkpointLocation", cp)
        .outputMode("append")
        .foreachBatch { (df: DataFrame, _: Long) =>
          got.synchronized { got ++= df.collect().map(r => (r.getString(0), r.getString(1))) }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      got.toSeq
    }
    paramFile("a", Seq(41L, 42L, 43L))
    val first = run()
    assert(first.distinct.size === first.size && first.nonEmpty)

    // run 2 re-posts pair 42 verbatim (identical caption AND image ⇒
    // both keys collide) plus one genuinely new cluster; the reopened
    // state must swallow the re-post
    paramFile("b", Seq(42L, 900L))
    val second = run()
    assert(second.size === 1,
      s"only the genuinely-new pair may pass the reopened state: $second")
    assert(!first.contains(second.head))
  }
}
