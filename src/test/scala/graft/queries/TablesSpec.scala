package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the type-aware `ts` ingestion contract (round 11): the driver
  * fixture's physical timestamp type has DRIFTED between rounds
  * (TIMESTAMP(NANOS) → TIMESTAMP(MICROS) mid-round-10, breaking 7
  * queries and 6 specs), so the single load point must normalize every
  * flavor to the repo-wide convention — bigint epoch NANOSECONDS —
  * and a future drift (millis, tz-adjusted) must land here, not in 7
  * query files. */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val wallMicros = 1700000000123456L // 2023-11-14T22:13:20.123456Z

  test("normalizeTs lifts TIMESTAMP_NTZ micros to epoch nanos (UTC, exact)") {
    val df = spark.range(1).select(
      timestamp_micros(lit(wallMicros)).cast(TimestampNTZType).as("ts"),
      lit(7L).as("other"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == LongType)
    assert(out.columns.toSeq == Seq("ts", "other"), "column order must be preserved")
    assert(out.head.getLong(0) == wallMicros * 1000L)
  }

  test("normalizeTs lifts TIMESTAMP (tz-adjusted) micros to epoch nanos") {
    val df = spark.range(1).select(timestamp_micros(lit(wallMicros)).as("ts"))
    assert(df.schema("ts").dataType == TimestampType)
    assert(Tables.normalizeTs(df).head.getLong(0) == wallMicros * 1000L)
  }

  test("normalizeTs passes LongType through untouched and ignores frames without ts") {
    val long = spark.range(1).select(lit(42L).as("ts"))
    assert(Tables.normalizeTs(long).head.getLong(0) == 42L)
    val none = spark.range(1).select(lit("x").as("a"))
    assert(Tables.normalizeTs(none).columns.toSeq == Seq("a"))
  }

  test("the loaded events fixture always surfaces ts as bigint nanos, batch and stream schema") {
    val ev = Tables(spark, TestSpark.sfDir, "events")
    assert(ev.schema("ts").dataType == LongType,
      s"events.ts must normalize to LongType nanos, got ${ev.schema("ts").dataType}")
    // plausibility: fixture timestamps are epoch nanos in [2000, 2100)
    val t = ev.agg(min("ts"), max("ts")).head
    val lo = 946684800L * 1000000000L
    val hi = 4102444800L * 1000000000L
    assert(t.getLong(0) >= lo && t.getLong(1) < hi,
      s"ts range ${t.getLong(0)}..${t.getLong(1)} not plausible epoch nanos")
    val st = Tables.streamEvents(spark, TestSpark.sfDir)
    assert(st.isStreaming && st.schema("ts").dataType == LongType)
  }
}
