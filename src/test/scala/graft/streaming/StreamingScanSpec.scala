package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.plumba.Kernel
import graft.plumba.syntax._
import org.apache.spark.sql.types.DoubleType

/** Streaming per-group scan == batch groupScan on the same data (single
  * micro-batch), and state carries across micro-batches. */
class StreamingScanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val balance = Kernel.Scan[Double](0.0, (acc, args) => {
    val x = args(0).asInstanceOf[Double]
    if (acc + x <= 1000.0) acc + x else acc
  })

  test("stream (one micro-batch) matches batch groupScan on events") {
    val dir = TestSpark.sfDir
    val batchDf = graft.queries.Tables(spark, dir, "events")
    // the streaming file source wants a directory; the stream must be
    // declared with the RAW footer schema (Tables normalizes ts)
    val streamDir = java.nio.file.Files.createTempDirectory("stream-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"), streamDir.resolve("events.parquet"))
    val rawSchema = spark.read.parquet(streamDir.toString).schema
    // normalize ts on the stream side too (as Tables.streamEvents does):
    // groupScanStream ignores ts today, but both sides must honor the
    // repo-wide ts convention so a future ts-ordered variant can't see
    // different types/values between the frames being compared
    val streamDf = graft.queries.Tables.normalizeTs(
      spark.readStream.schema(rawSchema).parquet(streamDir.toString))

    val q = StreamingScan.groupScanStream(streamDf, "user_id", "event_id", "value", balance)
      .toDF("user_id", "event_id", "balance")
      .writeStream.outputMode("append").format("memory").queryName("scan_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("scan_out")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Any](2)).toMap
    val batch = batchDf
      .groupScan(Seq("user_id"), Seq("value"), Seq("event_id"), balance, DoubleType, "balance")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Any](2)).toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch)
  }

  test("stream_multibatch_balance (4 real micro-batches) == batch groupFold final balances") {
    val dir = TestSpark.sfDir
    val streamed = graft.queries.StreamingQueries.streamMultibatchBalance(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Any](1)).toMap
    val k = graft.plumba.Kernel.Fold[Double](0.0, (acc, args) => {
      val x = args(0).asInstanceOf[Double]
      if (acc + x <= 1000.0) acc + x else acc
    })
    val batch = graft.queries.Tables(spark, dir, "events")
      .groupFold(Seq("user_id"), Seq("value"), Seq("event_id"), k, DoubleType, "balance")
      .collect().map(r => r.getLong(0) -> r.getAs[Any](1)).toMap
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("stream_dedup_watermarked (multi-batch) == batch distinct of the dedup key") {
    val dir = TestSpark.sfDir
    val streamed = graft.queries.StreamingQueries.streamDedupWatermarked(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.queries.Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("ts DIV 1000000000 DIV 3600 * 3600").as("hour_start"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty && streamed == batch,
      "watermarked streaming dedup must emit exactly the distinct key set")
  }

  test("left-outer stream-stream join: null-extension eviction boundary is STRICT (<)") {
    // Pins the boundary the stream_leftjoin_clicks_errors oracle
    // replays (the gate fixture has no click landing exactly on the
    // final watermark, so only this synthetic case distinguishes < from
    // <=): a click whose match-window end EQUALS the final watermark is
    // NOT yet evicted — it stays withheld in state at termination.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Long, Long, Long)] // (user, click_id, sec)
    val errors = MemoryStream[(Long, Long, Long)] // (user, error_id, sec)
    val t0 = 1000000L
    val wm = t0 + 3600L // target final watermark (seconds)
    val cdf = clicks.toDF.toDF("c_user", "click_id", "c_sec")
      .withColumn("c_ts", expr("CAST(c_sec AS TIMESTAMP)")).withWatermark("c_ts", "48 hours")
    val edf = errors.toDF.toDF("e_user", "error_id", "e_sec")
      .withColumn("e_ts", expr("CAST(e_sec AS TIMESTAMP)")).withWatermark("e_ts", "48 hours")
    val joined = cdf.join(edf,
        expr("c_user = e_user AND e_ts >= c_ts AND e_ts <= c_ts + INTERVAL 1 HOUR"), "leftOuter")
      .select(col("click_id"), coalesce(col("error_id"), lit(-1L)).as("error_id"))
    val q = joined.writeStream.format("memory").queryName("lj_boundary")
      .outputMode("append").start()
    try {
      // batch 1: three unmatched clicks for user 2 — window ends land
      // strictly below, exactly on, and strictly above the final watermark
      clicks.addData((2L, 1L, wm - 3700L), (2L, 2L, wm - 3600L), (2L, 3L, wm - 3500L))
      errors.addData((9L, 900L, t0 - 100000L)) // unrelated early error
      q.processAllAvailable()
      // batch 2: terminal matched pair on user 1 drives BOTH sides' max
      // event time to wm + 48 h, so the final global watermark is wm
      clicks.addData((1L, 10L, wm + 172800L))
      errors.addData((1L, 100L, wm + 172800L))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("lj_boundary").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.get(1L).contains(-1L),
      s"click strictly below the boundary must emit null-extended: $out")
    assert(!out.contains(2L),
      s"click exactly ON the watermark boundary must stay withheld (strict <): $out")
    assert(!out.contains(3L), s"click above the boundary must stay withheld: $out")
    assert(out.get(10L).contains(100L), s"terminal pair must match: $out")
  }

  test("state threads across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("stream-in").toString
    def write(batch: Seq[(Long, Long, Double)], name: String): Unit =
      batch.toDF("user_id", "event_id", "value").coalesce(1)
        .write.mode("append").parquet(dir)
    write(Seq((1L, 1L, 900.0), (1L, 2L, 200.0)), "b1") // 900, then reject (1100>1000)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingScan.groupScanStream(stream, "user_id", "event_id", "value", balance)
      .toDF("user_id", "event_id", "balance")
      .writeStream.outputMode("append").format("memory").queryName("scan_out2").start()
    try {
      q.processAllAvailable()
      write(Seq((1L, 3L, 50.0)), "b2") // second batch: 900 + 50 = 950
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("scan_out2").orderBy("event_id")
      .collect().map(_.getAs[Double]("balance")).toSeq
    assert(got == Seq(900.0, 900.0, 950.0))
  }

  test("stream_bpe_token_budget equals the batch rollup with the same trained artifact") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.queries.StreamingQueries.defs("stream_bpe_token_budget")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val trained = graft.queries.LlmQueries.trainedBpe(spark, dir)
    val batch = graft.queries.Tables(spark, dir, "documents")
      .select(col("source"),
        graft.llm.Bpe.tokenCount(col("text"), trained.merges).cast("long").as("n"))
      .groupBy("source").agg(count(lit(1)).as("n_docs"), sum("n").as("total_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(streamed == batch, s"stream/batch artifact application diverged: $streamed vs $batch")
    assert(streamed.map(_._2).sum == 500L)
  }
  test("watermark late-data accounting: genuinely late rows drop, counted in telemetry") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    // file 1 advances event time to t=10000s; file 2 carries one row at
    // t=5000s — 4900s beyond the 100s delay, so the watermark (9900s)
    // proves it late: it must be DROPPED from the closed window AND
    // show up in numRowsDroppedByWatermark, the telemetry a production
    // pipeline alerts on. The on-time row in the same batch aggregates
    // normally.
    val dir = java.nio.file.Files.createTempDirectory("graft_late_").toFile
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }
    try {
      val spark2 = spark
      import spark2.implicits._
      def spill(rows: Seq[Long], name: String, mtime: Long): Unit = {
        val stage = new java.io.File(dir, s"stage_$name")
        rows.toDF("sec").coalesce(1).write.parquet(stage.toString)
        val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(dir, s"$name.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(mtime); ()
      }
      spill(Seq(5100L, 5200L, 10000L), "00", 1700000000000L)
      // batch 2 exists so the [5000, 6000) window FINALIZES at its end
      // (Spark emits a window at the end of the batch in which the
      // watermark passes it — a late row arriving in that same batch
      // still merges; only rows arriving AFTER eviction drop)
      spill(Seq(10100L), "01", 1700000060000L)
      spill(Seq(5000L, 10150L), "02", 1700000120000L) // 5000 is late
      val schema = spark.read.parquet(dir + "/00.parquet").schema
      val src2 = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir + "/*.parquet")
      val agg = src2
        .withColumn("ets", col("sec").cast("timestamp"))
        .withWatermark("ets", "100 seconds")
        .groupBy(window(col("ets"), "1000 seconds")).agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("long").as("w"), col("n"))
      val name = "graft_late_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val ckpt = java.nio.file.Files.createTempDirectory("graft_late_ckpt_")
      val q = agg.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      val out = spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      spark.catalog.dropTempView(name)
      // the [5000, 6000) window closed with the two ON-TIME rows only
      assert(out.get(5000L).contains(2L),
        s"late row must not reopen or inflate the closed window: $out")
      val dropped = q.recentProgress
        .flatMap(_.stateOperators.headOption.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped == 1L, s"exactly the one late row counts as dropped, got $dropped")
    } finally rm(dir)
  }
}
