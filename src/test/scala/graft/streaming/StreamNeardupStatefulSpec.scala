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
  test("checkpoint restart recovers bucket state: no lost and no duplicated pairs") {
    import org.apache.spark.sql.streaming.Trigger
    // wave A lands before the stop; wave B (with a near-dup of an
    // A-doc) lands only after the restart — the pair can ONLY be found
    // if the restarted query recovers wave A's band state from the
    // checkpointed state store, and the file sink's commit log must
    // not re-emit wave A's output
    val dir = java.nio.file.Files.createTempDirectory("graft_nsrs_").toFile
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }
    try {
      val waveA = Seq((1L, base),
        (2L, "early filler document with plenty of distinct words to shingle"))
      val waveB = Seq((3L, base.replace("square", "plaza")),
        (4L, "late filler document with plenty of other distinct words to shingle"))
      val data = new java.io.File(dir, "data"); data.mkdirs()
      def spillTo(rows: Seq[(Long, String)], name: String, mtime: Long): Unit = {
        val stage = new java.io.File(dir, s"stage_$name")
        rows.toDF("doc_id", "text").coalesce(1).write.parquet(stage.toString)
        val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(data, s"$name.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(mtime); ()
      }
      spillTo(waveA, "00", 1700000000000L)
      val schema = spark.read.parquet(data + "/00.parquet").schema
      val out = new java.io.File(dir, "out")
      val ckpt = new java.io.File(dir, "ckpt")
      def run(): Unit = {
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(data.getPath + "/*.parquet")
        val hits = StreamingNearDup.neardupStateful(src, horizonSec = 100L * 24 * 3600)
        val q = hits.toDF().writeStream.format("json")
          .option("path", out.toString).option("checkpointLocation", ckpt.toString)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination() finally q.stop()
      }
      run() // first run: wave A only, state checkpointed
      spillTo(waveB, "01", 1700000060000L)
      run() // restart: wave B probes RECOVERED wave-A state
      val emitted = spark.read
        .schema("bucket STRING, cand_id LONG, probe_id LONG, est_jaccard DOUBLE")
        .json(out.toString)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      // exactly the batch pairwise result, once each: the cross-restart
      // pair (1, 3) found, nothing lost, nothing double-emitted
      val docs = (waveA ++ waveB).toDF("doc_id", "text")
      val bk = Dedup.bandBuckets(Dedup.shingleHashSets(docs, "doc_id", "text"))
      val a = bk.select(col("bucket"), col("id").as("cand_id"), col("sig").as("cand_sig"))
      val b = bk.select(col("bucket"), col("id").as("probe_id"), col("sig"))
      val batch = a.join(b, "bucket").filter(col("cand_id") < col("probe_id"))
        .withColumn("est", Dedup.signatureSimilarity(col("cand_sig"), col("sig")))
        .filter(col("est") >= 0.3)
        .select(col("bucket"), col("cand_id"), col("probe_id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(emitted.sorted == batch.sorted,
        s"restart must neither lose nor duplicate: emitted=${emitted.sorted} batch=${batch.sorted}")
      assert(emitted.exists(h => h._2 == 1L && h._3 == 3L),
        "the cross-restart near-dup (1, 3) must be caught from recovered state")
    } finally rm(dir)
  }
  test("the hot-bucket state cap: probe-then-add-if-room == the ROW_NUMBER oracle mirror") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.expressions.Window
    // four near-identical docs share most (not all) band buckets; cap 2
    // is PER BUCKET — the rank-cap rule the gate's oracle states: a
    // pair (i, j) is emitted exactly through buckets where i's
    // within-bucket arrival rank is <= 2
    val dir = java.nio.file.Files.createTempDirectory("graft_nscap_").toFile
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }
    try {
      val docs = Seq(
        (1L, base), (2L, base.replace("square", "plaza")),
        (3L, base.replace("square", "court")), (4L, base.replace("square", "green")))
      val stage = new java.io.File(dir, "stage")
      docs.toDF("doc_id", "text").coalesce(1).write.parquet(stage.toString)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir, "00.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      val schema = spark.read.parquet(dst.toString).schema
      val src2 = spark.readStream.schema(schema).parquet(dir + "/*.parquet")
      val hits = StreamingNearDup.neardupStateful(src2,
        horizonSec = 100L * 24 * 3600, maxBucket = 2)
      val name = "graft_nscap_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val ckpt = java.nio.file.Files.createTempDirectory("graft_nscap_ckpt_")
      val q = hits.toDF().writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      val streamed = spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      spark.catalog.dropTempView(name)

      // the oracle mirror: per-bucket doc_id rank, cand rank <= cap
      val bk = Dedup.bandBuckets(Dedup.shingleHashSets(
        docs.toDF("doc_id", "text"), "doc_id", "text"))
      val rk = bk.withColumn("rn",
        row_number().over(Window.partitionBy("bucket").orderBy("id")))
      val a = rk.filter(col("rn") <= 2)
        .select(col("bucket"), col("id").as("cand_id"), col("sig").as("cand_sig"))
      val b = rk.select(col("bucket"), col("id").as("probe_id"), col("sig"))
      val expect = a.join(b, "bucket").filter(col("cand_id") < col("probe_id"))
        .filter(Dedup.signatureSimilarity(col("cand_sig"), col("sig")) >= 0.3)
        .select(col("bucket"), col("cand_id"), col("probe_id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == expect,
        s"cap divergence: ${streamed.diff(expect)} vs ${expect.diff(streamed)}")
      // the cap actually bit: some shared bucket refused doc 3's join,
      // so at least one (bucket, 3, 4) row present in the UNCAPPED run
      // is absent here
      val allPairs = bk.select(col("bucket"), col("id").as("cand_id"), col("sig").as("cand_sig"))
        .join(b, "bucket").filter(col("cand_id") < col("probe_id"))
        .filter(Dedup.signatureSimilarity(col("cand_sig"), col("sig")) >= 0.3)
        .select(col("bucket"), col("cand_id"), col("probe_id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed.subsetOf(allPairs) && streamed != allPairs,
        s"cap 2 must refuse at least one over-rank candidate: capped=${streamed.size} all=${allPairs.size}")
    } finally rm(dir)
  }
}
