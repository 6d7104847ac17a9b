package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** RESTART-FROM-CHECKPOINT for the other stateful streams (round-17
  * verdict item #4): `stream_cms_matrix` and `stream_dsir_score`
  * measure their bounded-state claims, but their recovery contracts
  * were untested across the exact failure streaming exists to survive.
  * Both states are pure integers — CMS counters and per-doc
  * (count, sum) — so exact continuation is assertable: a REAL
  * checkpoint is written, the query stops, new files arrive, and a
  * fresh query reopened from the same checkpoint must emit values that
  * only a surviving state can produce (cumulative counters spanning
  * the restart; a doc whose grams straddle the restart scoring its
  * FULL total). */
class StreamRestartSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshRoot(tag: String): java.io.File = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_rst_$tag").toFile
    sys.addShutdownHook { def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }; rm(root) }
    root
  }

  /** Write rows as one parquet file into srcDir under a fixed name. */
  private def addFile(root: java.io.File, srcDir: java.io.File, name: String,
      rows: Seq[(Long, String)]): Unit = {
    val s = spark
    import s.implicits._
    val stage = new java.io.File(root, s"stage_$name")
    rows.toDF("doc_id", "text").coalesce(1).write.parquet(stage.toString)
    val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      new java.io.File(srcDir, s"$name.parquet").toPath)
    ()
  }

  /** Run a streaming query over srcDir from the given checkpoint,
    * collecting every update-mode emission via foreachBatch. */
  private def runCollect(srcDir: java.io.File, cp: String,
      build: DataFrame => DataFrame): Seq[org.apache.spark.sql.Row] = {
    val schema = spark.read.parquet(srcDir.listFiles().head.toString).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString + "/*.parquet")
    val out = build(src)
    val got = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val q = out.writeStream
      .option("checkpointLocation", cp)
      .outputMode("update")
      .foreachBatch { (df: DataFrame, _: Long) =>
        got.synchronized { got ++= df.collect() }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    got.toSeq
  }

  test("stream_cms_matrix: counters continue EXACTLY across a restart") {
    val root = freshRoot("cms")
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    val cp = new java.io.File(root, "cp").toString
    val b1 = Seq(1L -> "alpha beta gamma alpha", 2L -> "beta delta")
    val b2 = Seq(3L -> "alpha epsilon", 4L -> "zeta beta beta")
    addFile(root, srcDir, "a", b1)
    def cms(src: DataFrame) =
      graft.llm.Sketches.cmsCounters(src, "text", depth = 4, width = 256)

    // run 1: batch b1 checkpointed
    val first = runCollect(srcDir, cp, cms)
    assert(first.nonEmpty)

    // run 2: a fresh query REOPENS the checkpoint, sees only b2, and
    // must emit counters CUMULATIVE over b1 ∪ b2 — values only the
    // restored state can produce
    addFile(root, srcDir, "b", b2)
    val second = runCollect(srcDir, cp, cms)
    assert(second.nonEmpty, "the reopened query must process the new file")

    val s = spark
    import s.implicits._
    val expected = cms((b1 ++ b2).toDF("doc_id", "text"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every run-2 emission is a (i, bucket) cell touched by b2 carrying
    // its FULL cumulative count; tokens shared with b1 (alpha, beta)
    // make continuation observable
    second.foreach { r =>
      val cell = (r.getInt(0), r.getLong(1))
      assert(r.getLong(2) === expected(cell),
        s"cell $cell: restart emitted ${r.getLong(2)}, full-corpus count ${expected(cell)}")
    }
    // at least one emitted cell must EXCEED its b2-only count — the
    // direct witness that pre-restart state contributed
    val b2only = cms(b2.toDF("doc_id", "text"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(second.exists { r =>
      r.getLong(2) > b2only.getOrElse((r.getInt(0), r.getLong(1)), 0L)
    }, "no emission shows cross-restart accumulation")
  }

  test("stream_dsir_score: a doc whose grams straddle the restart scores its full total") {
    val root = freshRoot("dsir")
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    val cp = new java.io.File(root, "cp").toString
    val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
    val weights = graft.llm.Sampling.dsirWeights(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", col("lang") === "en", 1024)
      .localCheckpoint(true)
    def score(src: DataFrame) =
      graft.llm.Sampling.dsirScoreFrozen(weights, src, "doc_id", "text", 1024)
        .select(col("id").as("doc_id"), col("n_grams"), col("dsir_score"))

    // doc 999 arrives in TWO halves, one per run: its second emission
    // must aggregate grams from BOTH — only a surviving (count, sum)
    // state can do that
    val half1 = "the quick brown fox jumps over the lazy dog"
    val half2 = "while rain falls on the quiet town square"
    addFile(root, srcDir, "a", Seq(999L -> half1, 1L -> "ships and harbors at dawn"))
    val first = runCollect(srcDir, cp, score)
    assert(first.exists(_.getLong(0) == 999L))

    addFile(root, srcDir, "b", Seq(999L -> half2))
    val second = runCollect(srcDir, cp, score)
    val row999 = second.filter(_.getLong(0) == 999L)
    assert(row999.length === 1, s"doc 999 must re-emit once after restart: $second")

    val s = spark
    import s.implicits._
    val expected = score(Seq(999L -> half1, 999L -> half2).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    assert((row999.head.getLong(0), row999.head.getLong(1), row999.head.getLong(2))
      === expected,
      "the post-restart emission must equal the batch score over both halves")
    // and the unrelated doc must NOT re-emit (update mode + intact state)
    assert(!second.exists(_.getLong(0) == 1L),
      "doc 1 did not change in run 2 — a re-emission means state was lost")
  }
}
