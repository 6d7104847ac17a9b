package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.Dedup
import graft.queries.StreamingQueries

/** Stateful streaming near-dup ([[StreamingNearDup]]): the growing
  * in-stream index. Pins (1) equality with the batch pairwise band
  * join (the prefix-replay semantics the oracle re-verifies in
  * DuckDB), (2) the cross-batch catch — a near-dup pair split across
  * micro-batch files is found, which the stateless probe cannot do for
  * in-stream arrivals, and (3) the event-time eviction path: with a
  * tight horizon, bucket state for long-idle bands is removed (state
  * tracks the horizon, not history). */
class StreamNeardupStatefulSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while rain falls on the quiet town square"

  private lazy val fixtureDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_nsfix_").toFile
    sys.addShutdownHook { def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }; rm(dir) }
    // ids chosen so the 4-file id-quartile spill separates the planted
    // near-dup pair (2, 77) across micro-batches: quartiles over
    // max_id=99 put 2 in file 0 and 77 in file 3
    val docs = Seq(
      (2L, base),
      (10L, "completely different corpus text about ships and harbors at dawn light"),
      (40L, "another unrelated corpus document mentioning mountains rivers and long hiking trails"),
      (60L, "short filler corpus entry with enough words to shingle cleanly today"),
      (77L, base.replace("square", "plaza")), // near-dup of doc 2, 3 batches later
      (99L, "totally novel late content sharing no shingles with any earlier document at all")
    ).toDF("doc_id", "text")
    docs.coalesce(1).write.parquet(new java.io.File(dir, "documents.parquet").toString)
    dir.toString
  }

  test("stateful stream equals the batch pairwise band join; the cross-batch pair is caught") {
    val streamed = StreamingQueries.streamNeardupStateful(spark, fixtureDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    val docs = spark.read.parquet(s"$fixtureDir/documents.parquet").select("doc_id", "text")
    val bk = Dedup.bandBuckets(Dedup.shingleHashSets(docs, "doc_id", "text"))
    val a = bk.select(col("bucket"), col("id").as("cand_id"), col("sig").as("cand_sig"))
    val b = bk.select(col("bucket"), col("id").as("probe_id"), col("sig"))
    val batch = a.join(b, "bucket").filter(col("cand_id") < col("probe_id"))
      .withColumn("est_jaccard", Dedup.signatureSimilarity(col("cand_sig"), col("sig")))
      .filter(col("est_jaccard") >= 0.3)
      .select(col("bucket"), col("cand_id"), col("probe_id"), col("est_jaccard"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    assert(streamed == batch,
      s"stream/batch divergence: ${streamed.diff(batch)} vs ${batch.diff(streamed)}")
    // the planted pair (2 -> 77) spans micro-batches and is caught
    assert(streamed.exists(h => h._2 == 2L && h._3 == 77L),
      s"cross-batch near-dup (2, 77) must be caught: $streamed")
    // the novel doc matches nothing
    assert(!streamed.exists(h => h._3 == 99L), "novel doc must produce no hits")
  }

  test("tight horizon evicts idle bucket state (state tracks the horizon, not history)") {
    import org.apache.spark.sql.streaming.Trigger
    // two waves of docs 5000 "seconds" apart; horizon 1000s: wave-1
    // buckets must be evicted before wave 2 arrives, so the (1, 7001)
    // near-dup pair is NOT emitted and end-of-stream state holds only
    // wave-2 bands
    val dir = java.nio.file.Files.createTempDirectory("graft_nsev_").toFile
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }
    try {
      val wave1 = Seq((1L, base), (2L, "early filler document with plenty of distinct words to shingle"))
      val wave2 = Seq((7001L, base.replace("square", "plaza")),
        (7002L, "late filler document with plenty of other distinct words to shingle"))
      def spill(rows: Seq[(Long, String)], name: String, mtime: Long): Unit = {
        val stage = new java.io.File(dir, s"stage_$name")
        rows.toDF("doc_id", "text").coalesce(1).write.parquet(stage.toString)
        val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(dir, s"$name.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(mtime); ()
      }
      spill(wave1, "00", 1700000000000L)
      spill(wave2, "01", 1700000060000L)
      val schema = spark.read.parquet(dir + "/00.parquet").schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir + "/*.parquet")
      val hits = StreamingNearDup.neardupStateful(src, horizonSec = 1000L)
      val name = "graft_nsev_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val ckpt = java.nio.file.Files.createTempDirectory("graft_nsev_ckpt_")
      val q = hits.toDF().writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      val out = spark.table(name).collect()
      assert(!out.exists(r => r.getLong(1) == 1L && r.getLong(2) == 7001L),
        "wave-1 state must be evicted before wave 2: the (1, 7001) pair may not match")
      // end-of-stream state: only wave-2 bands remain (8 bands per doc,
      // 2 docs, minus any shared buckets)
      val lastState = q.recentProgress.reverse.flatMap(_.stateOperators.headOption)
        .headOption.map(_.numRowsTotal).getOrElse(-1L)
      val wave2Bands = Dedup.bandBuckets(Dedup.shingleHashSets(
        wave2.toDF("doc_id", "text"), "doc_id", "text"))
        .select("bucket").distinct().count()
      assert(lastState == wave2Bands,
        s"state after eviction must be wave-2's distinct bands ($wave2Bands), got $lastState")
      spark.catalog.dropTempView(name)
    } finally rm(dir)
  }
}
