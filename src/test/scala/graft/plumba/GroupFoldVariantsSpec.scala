package graft.plumba

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.plumba.Kernel._
import graft.plumba.syntax._

/** Differential tests: every per-group fold route must agree. */
class GroupFoldVariantsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def events = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
  }

  test("groupFoldMergeable (range-salted partials) == groupFold for a mergeable sum") {
    val mergeable = Fold[Double](
      0.0, (acc, args) => acc + args(0).asInstanceOf[Double],
      merge = Some(Merge(0.0, (a: Double, b: Double) => a + b)))
    val salted = GroupOps.groupFoldMergeable(
        events, Seq("user_id"), Seq("value"), Seq("ts", "event_id"), mergeable, DoubleType, buckets = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sequential = events
      .groupFold(Seq("user_id"), Seq("value"), Seq("ts", "event_id"), mergeable, DoubleType)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == sequential.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - sequential(k)) < 1e-9, s"user $k") }
  }

  test("groupFoldMergeable == groupFold for the ORDER-SENSITIVE streak kernel") {
    // streak of value > 50 per user: order across range buckets matters —
    // this is the test that would catch an unordered/hash salt.
    val k = Streak.kernel[Double](_ > 50.0)
    val salted = GroupOps.groupFoldMergeable(
        events, Seq("user_id"), Seq("value"), Seq("ts", "event_id"), k, DoubleType,
        buckets = 8, emit = (a: Streak.S) => Streak.best(a).toDouble)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sequential = GroupOps.groupFold(
        events, Seq("user_id"), Seq("value"), Seq("ts", "event_id"), k, DoubleType,
        emit = (a: Streak.S) => Streak.best(a).toDouble)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(salted == sequential)
  }

  test("groupFoldMergeable rejects kernels without a Merge declaration") {
    val plain = Fold[Double](0.0, (acc, args) => acc + args(0).asInstanceOf[Double])
    intercept[IllegalArgumentException] {
      GroupOps.groupFoldMergeable(
        events, Seq("user_id"), Seq("value"), Seq("ts"), plain, DoubleType)
    }
  }

  test("SortedFoldAggregator under groupBy().agg() == GroupOps.groupFold (balance kernel)") {
    val balance = Fold[Double](0.0, (acc, args) => {
      val x = args(0).asInstanceOf[Double]
      if (acc + x <= 1000.0) acc + x else acc
    })
    val viaAgg = events.groupBy("user_id")
      .agg(SortedFoldAggregator.foldColumn(
        Seq(col("ts"), col("event_id")), Seq(col("value")), balance).as("balance"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaGroupOps = events
      .groupFold(Seq("user_id"), Seq("value"), Seq("ts", "event_id"), balance, DoubleType)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaAgg == viaGroupOps)
  }

  test("SortedFoldAggregator composes with other aggregates in one agg list") {
    val balance = Fold[Double](0.0, (acc, args) => {
      val x = args(0).asInstanceOf[Double]
      if (acc + x <= 1000.0) acc + x else acc
    })
    val r = events.groupBy("user_id")
      .agg(
        SortedFoldAggregator.foldColumn(Seq(col("ts"), col("event_id")), Seq(col("value")), balance).as("balance"),
        count(lit(1)).as("n"),
        max(col("value")).as("mx"))
      .orderBy("user_id").limit(3).collect()
    assert(r.forall(row => row.getDouble(1) <= 1000.0 && row.getLong(2) > 0))
  }
}
