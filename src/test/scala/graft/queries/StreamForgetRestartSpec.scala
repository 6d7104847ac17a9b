package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Restart contract for the streaming forget door
  * ([[graft.streaming.StreamingForget]]): dedup state must survive a
  * reopened checkpoint (a redelivered fingerprint still reads `dup`),
  * AND a tombstone arriving AFTER the restart must remove state that
  * was written BEFORE it — re-ingested content then passes as `kept`.
  * The second property is the one `dropDuplicates` state cannot
  * express and the whole reason the operator exists. */
class StreamForgetRestartSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshRoot(tag: String): java.io.File = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_rst_$tag").toFile
    sys.addShutdownHook { def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }; rm(root) }
    root
  }

  test("stream_forget_tombstone: liveness survives restart; a post-restart tombstone frees the hash") {
    val root = freshRoot("forget")
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    val cp = new java.io.File(root, "cp").toString
    def eventFile(name: String, rows: Seq[(String, Long, Long, Int)]): Unit = {
      val s = spark
      import s.implicits._
      val stage = new java.io.File(root, s"stage_$name")
      rows.toDF("content_hash", "seq", "doc_id", "op")
        .coalesce(1).write.parquet(stage.toString)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(srcDir, s"$name.parquet").toPath)
      ()
    }
    def run(): Seq[(String, Long, Long, String)] = {
      val schema = spark.read.parquet(srcDir.listFiles().head.toString).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString + "/*.parquet")
      val acks = graft.streaming.StreamingForget.forgetTombstone(src.toDF())
      val got = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, String)]
      val q = acks.toDF().writeStream.option("checkpointLocation", cp)
        .outputMode("append")
        .foreachBatch { (df: DataFrame, _: Long) =>
          got.synchronized {
            got ++= df.collect().map(r =>
              (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
          }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      got.toSeq.sortBy(r => (r._1, r._2))
    }

    // run 1: two distinct fingerprints ingest and go live
    eventFile("a", Seq(("h1", 1L, 1L, 0), ("h2", 2L, 2L, 0)))
    val first = run()
    assert(first === Seq(("h1", 1L, 1L, "kept"), ("h2", 2L, 2L, "kept")))

    // run 2 (reopened checkpoint): the tombstone must find h1's state
    // (written before the restart) and remove it, so doc 99's
    // re-ingest of the same content passes as kept; h2's state must
    // also have survived — its redelivery reads dup
    eventFile("b", Seq(("h1", 3L, 1L, 1), ("h1", 4L, 99L, 0), ("h2", 5L, 100L, 0)))
    val second = run()
    assert(second === Seq(
      ("h1", 3L, 1L, "forgotten"),
      ("h1", 4L, 99L, "kept"),
      ("h2", 5L, 100L, "dup")))

    // run 3: an at-least-once REDELIVERY across the restart — h2's seq
    // 5 arrives again in a later trigger. The lastSeq guard (persisted
    // in the v2 envelope, so it survives the reopened checkpoint) must
    // read it as stale and leave state untouched: the next fresh event
    // still sees h2 live.
    eventFile("c", Seq(("h2", 5L, 100L, 0), ("h2", 6L, 101L, 0)))
    val third = run()
    assert(third === Seq(
      ("h2", 5L, 100L, "stale"),
      ("h2", 6L, 101L, "dup")))
  }

  test("state envelope: v1 upgrades, v2 round-trips, a future version refuses loudly") {
    import graft.streaming.StreamingForget.{Fp, FpState}
    assert(FpState.decode(FpState.encode(Fp(42L, 7L))) === Fp(42L, 7L))
    // a v1 checkpoint entry (bare keeper) decodes with the guard off
    val v1 = {
      val b = java.nio.ByteBuffer.allocate(8); b.putLong(42L)
      FpState(1, b.array())
    }
    assert(FpState.decode(v1) === Fp(42L, Long.MinValue))
    val e = intercept[IllegalStateException] {
      FpState.decode(FpState(FpState.CurrentVersion + 1, Array.fill[Byte](16)(0)))
    }
    assert(e.getMessage.contains(s"version ${FpState.CurrentVersion + 1}"))
  }
}
