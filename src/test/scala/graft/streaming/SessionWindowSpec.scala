package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the two `session_window` boundaries the stream_session_windows
  * oracle replays: (a) the merge rule at exactly-gap spacing, (b) the
  * append-mode emission rule at the final watermark. The gate fixture
  * has no event landing exactly on either boundary, so only these
  * synthetic cases distinguish strict from non-strict. */
class SessionWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("session_window: gap-equality merge rule and watermark emission rule") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = MemoryStream[(Long, Long)] // (user, sec)
    val t0 = 1000000L
    val df = ev.toDF.toDF("user_id", "sec")
      .withColumn("ets", expr("CAST(sec AS TIMESTAMP)"))
      .withWatermark("ets", "0 seconds")
    val agg = df.groupBy(session_window(col("ets"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("ss"),
        col("session_window.end").cast("long").as("se"), col("n"))
    val q = agg.writeStream.format("memory").queryName("sw_boundary")
      .outputMode("append").start()
    try {
      // user 1: two events exactly gap (1800 s) apart; user 2: 1799 s
      // apart (must merge); user 3: 1801 s apart (must split);
      // user 4: a session whose end (event + gap) lands EXACTLY on the
      // final watermark
      ev.addData((1L, t0), (1L, t0 + 1800L),
        (2L, t0), (2L, t0 + 1799L),
        (3L, t0), (3L, t0 + 1801L),
        (4L, t0 + 1000000L - 1800L))
      q.processAllAvailable()
      // terminal event far ahead advances the watermark past every
      // earlier session's end; its own session must stay withheld
      ev.addData((9L, t0 + 1000000L))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sw_boundary").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toList
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    // merge rule is NON-STRICT: an event exactly `gap` after the
    // previous one still extends the session (end = last event + gap)
    assert(out(1L) == List((t0, t0 + 3600L, 2L)),
      s"events exactly gap apart must merge: $out")
    assert(out(2L) == List((t0, t0 + 1799L + 1800L, 2L)),
      s"events 1799 s apart must merge into one session: $out")
    assert(out(3L) == List((t0, t0 + 1800L, 1L), (t0 + 1801L, t0 + 3601L, 1L)),
      s"events gap+1 s apart must split: $out")
    // emission rule is NON-STRICT (<=): a session whose end EQUALS the
    // final watermark IS emitted
    assert(out.get(4L).contains(List((t0 + 998200L, t0 + 1000000L, 1L))),
      s"session ending exactly on the watermark must emit: $out")
    assert(!out.contains(9L),
      s"the terminal session (end past the final watermark) must stay withheld: $out")
  }
}
